"""Framework-wide constants.

These mirror the reference's batch/token contract so datasets, checkpoints and
eval-trial metadata interchange with the original codebase
(reference: multimodal/multimodal_data_module.py:37-57).
"""

# special tokens (ids are part of the data contract; do not change)
PAD_TOKEN = "<pad>"
UNK_TOKEN = "<unk>"
SOS_TOKEN = "<sos>"
EOS_TOKEN = "<eos>"
PAD_TOKEN_ID = 0
UNK_TOKEN_ID = 1
SOS_TOKEN_ID = 2
EOS_TOKEN_ID = 3
SPECIAL_TOKENS = [PAD_TOKEN, UNK_TOKEN, SOS_TOKEN, EOS_TOKEN]

# every text-encoder call is a fixed-shape jit: utterances are statically
# padded/truncated to this length (reference: multimodal_data_module.py:37)
MAX_LEN_UTTERANCE = 25

# image contract: 224x224 RGB, ImageNet-normalized
IMAGE_H = 224
IMAGE_W = 224
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# CLIP normalization (used only by the CLIP-baseline eval path,
# reference: multimodal_data_module.py:256-267)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)

# the val loader of each split is a pair: [val-split loader, eval-trial loader]
# (reference: multimodal_data_module.py:32)
N_VAL_DATALOADERS_PER_SPLIT = 2

# mesh axis names used across the framework
DATA_AXIS = "data"   # batch / data-parallel axis (rides ICI within a slice)
MODEL_AXIS = "model"  # tensor-parallel axis (vocab- / feature-sharded layers)
