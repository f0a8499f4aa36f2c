from multimodal_baby_tpu.ops.infonce import fused_infonce, infonce_loss
from multimodal_baby_tpu.ops.lstm import lstm_fused
