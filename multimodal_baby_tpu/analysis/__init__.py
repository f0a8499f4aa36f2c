from multimodal_baby_tpu.analysis.ngram import NGramModel
from multimodal_baby_tpu.analysis.attention_maps import (
    grad_cam, get_attention_overlay)
from multimodal_baby_tpu.analysis.representation_similarity import (
    rsa, cosine_similarity_matrix)
from multimodal_baby_tpu.analysis.summaries import (
    SUMMARY_COLUMNS, gather_results, load_predictions, summarize,
    write_ablations_summary, write_bounds_summary,
    write_object_categories_summary, write_summary, write_summary_csv)
from multimodal_baby_tpu.analysis.descriptives import (
    corpus_stats, length_distribution, frequency_table)
