from multimodal_baby_tpu.core.constants import (
    PAD_TOKEN_ID, UNK_TOKEN_ID, SOS_TOKEN_ID, EOS_TOKEN_ID,
    MAX_LEN_UTTERANCE, IMAGE_H, IMAGE_W, DATA_AXIS, MODEL_AXIS,
)
from multimodal_baby_tpu.core.config import (
    VisionConfig, TextConfig, ModelConfig, TrainConfig, DataConfig,
    ParallelConfig, ExperimentConfig, apply_overrides,
)
