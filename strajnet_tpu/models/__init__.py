from strajnet_tpu.models.strajnet import STrajNet
from strajnet_tpu.models.swin import SwinTransformerEncoder
from strajnet_tpu.models.decoder import Pyramid3DDecoder
from strajnet_tpu.models.trajnet import TrajNetCrossAttention
from strajnet_tpu.models.fgmsa import FGMSA

__all__ = [
    "STrajNet",
    "SwinTransformerEncoder",
    "Pyramid3DDecoder",
    "TrajNetCrossAttention",
    "FGMSA",
]
