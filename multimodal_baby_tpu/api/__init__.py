from multimodal_baby_tpu.api.model import CVCLModel, load_model, preprocess
from multimodal_baby_tpu.api import convert
