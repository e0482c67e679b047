from .containers import SpherePoints, identity_pose, occupancy_features, preprocess_input
from .norm import EquivNorm
from .so3conv import (
    InterSO3Conv,
    IntraSO3Conv,
    SO3Linear,
    inter_kernel_weights,
    intra_group_gather,
    snap_rel_rotation_perm,
)
from .blocks import ConvBlockSpec, InterSO3ConvBlock, SO3Backbone, SeparableSO3ConvBlock, make_backbone_specs
from .outblocks import InvOutBlock, InvPPOutBlock, PointnetSO3Conv, masked_mean
from .heads import SO3PoseHead, SO3PrismaticHead
from .slot_attention import SlotAttention
from .decoders import (
    DecoderConstantCommon,
    DecoderFC,
    DecoderFCAtlas,
    DecoderFCAxis,
    DecoderFCWithCuboid,
    DecoderFCWithPVPCuboid,
    DecoderFCWithPVP,
    DecoderFCWithPVPAtlas,
    DecoderFCWithPVPConstantCommon,
    cuboid_axis_normal_loss,
    cuboid_fit_loss,
)
