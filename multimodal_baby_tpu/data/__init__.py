from multimodal_baby_tpu.data.vocab import Vocab
from multimodal_baby_tpu.data.tokenizer import Tokenizer, word_tokenize
from multimodal_baby_tpu.data.datasets import (
    EvalTrialDataset, PairedImageTextDataset, SyntheticPairedDataset,
    TextEvalTrialDataset, load_metadata)
from multimodal_baby_tpu.data.loader import DataLoader, collate
from multimodal_baby_tpu.data.modules import DataModule
from multimodal_baby_tpu.data.augment import augment_batch, normalize_image
