from multimodal_baby_tpu.ops.bottleneck_hwbc import (
    from_hwbc, fused_bottleneck_hwbc, fused_bottleneck_tiles,
    fused_stage_banded, fused_stage_hwbc, to_hwbc)
from multimodal_baby_tpu.ops.infonce import fused_infonce, infonce_loss
from multimodal_baby_tpu.ops.lstm import lstm_fused
from multimodal_baby_tpu.ops.quant import (
    bottleneck_reference_q, fold_block_params_q, quantize_activation,
    quantize_weight)
from multimodal_baby_tpu.ops.vit_block import (fused_vit_block,
                                               should_fuse_vit_block)
