from .discriminator import Discriminator, DisentangledDiscriminator
from .extras import (
    MLP,
    BigBiGANDiscriminator,
    CameraParamDiscriminator,
    CameraParamGenerator,
    Encoder,
    OccupancyNet,
)
from .generators import (
    DCGANGenerator,
    MappingNetwork,
    StyleGANGenerator,
    StyleGenerator,
    SynthesisBlock,
    dcgan_make_hidden,
    mapping_make_hidden,
    stylegan_make_hidden,
)

__all__ = [
    "MappingNetwork",
    "SynthesisBlock",
    "StyleGenerator",
    "StyleGANGenerator",
    "DCGANGenerator",
    "Discriminator",
    "DisentangledDiscriminator",
    "Encoder",
    "OccupancyNet",
    "MLP",
    "BigBiGANDiscriminator",
    "CameraParamGenerator",
    "CameraParamDiscriminator",
    "stylegan_make_hidden",
    "dcgan_make_hidden",
    "mapping_make_hidden",
]
