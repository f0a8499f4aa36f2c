from multimodal_baby_tpu.evaluation.forced_choice import (
    run_forced_choice, save_predictions, print_accuracy_table)
