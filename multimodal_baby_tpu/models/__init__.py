from multimodal_baby_tpu.models.multimodal import CVCL, l2_normalize
from multimodal_baby_tpu.models.text import TextEncoder
from multimodal_baby_tpu.models.vision import VisionEncoder
from multimodal_baby_tpu.models.vision_resnext import ResNeXt50
from multimodal_baby_tpu.models.vision_vit import (
    VisionTransformerDino, vit_base, vit_small, vit_large)
from multimodal_baby_tpu.models.attention import AdditiveAttention
from multimodal_baby_tpu.models import losses
from multimodal_baby_tpu.models.beam_search import beam_search
