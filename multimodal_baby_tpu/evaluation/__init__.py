from multimodal_baby_tpu.evaluation.forced_choice import (
    run_forced_choice, save_predictions, print_accuracy_table)
from multimodal_baby_tpu.evaluation.linear_probe import (
    extract_backbone_features, probe_forced_choice, train_linear_probe)
from multimodal_baby_tpu.evaluation.textgen import (
    ids_to_sentence, run_textgen_eval)
from multimodal_baby_tpu.evaluation import textgen_metrics
