from multimodal_baby_tpu.analysis.ngram import NGramModel
from multimodal_baby_tpu.analysis.attention_maps import (
    grad_cam, get_attention_overlay)
from multimodal_baby_tpu.analysis.representation_similarity import (
    rsa, cosine_similarity_matrix)
from multimodal_baby_tpu.analysis.summaries import (
    load_predictions, summarize, write_summary)
from multimodal_baby_tpu.analysis.descriptives import (
    corpus_stats, length_distribution, frequency_table)
