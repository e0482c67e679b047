from .dgcnn import (
    DGCNNEncoder,
    DGCNNSeg,
    PrimitiveNet,
    PrimitivesEmbeddingDGCNN,
    segment_from_embedding,
)
from .pointnet2 import PointNet2Seg, PointnetPP
