from .dgcnn import DGCNNSeg
from .pointnet2 import PointNet2Seg
