"""Training-data operators: dedup, similarity search, text analysis,
multimodal stages (see COVERAGE.md for the full map)."""

from .dedup import (ContentHash, MinHashSignatures, SimHash, VerifyJaccard,
                    choose_nbits, embedding_dup_pairs, exact_dedup, jaccard,
                    minhash_lsh_candidates, ngram_set, simhash_candidates,
                    verify_jaccard)
from .multimodal import (AudioFeatures, DecodeImage, FrameSample,
                         ResizeImage, image_pipeline, synth_binary_images,
                         synth_png_images, synth_wav_audio)
from .similarity import brute_force_topk, ivf_topk
from .sketch import (approx_count_distinct, approx_top_k, estimate,
                     fold_batch)
from .text import (Fingerprint, LangId, QualityScore, TextAnalyzer,
                   TextStats, token_count_table)
from .windows import session_window_agg, sliding_window_agg

__all__ = [
    "ContentHash", "MinHashSignatures", "SimHash", "VerifyJaccard",
    "choose_nbits", "embedding_dup_pairs", "exact_dedup", "jaccard",
    "minhash_lsh_candidates", "ngram_set", "simhash_candidates",
    "verify_jaccard",
    "AudioFeatures", "DecodeImage", "FrameSample", "ResizeImage",
    "image_pipeline", "synth_binary_images", "synth_png_images",
    "synth_wav_audio", "brute_force_topk", "ivf_topk",
    "Fingerprint", "LangId", "QualityScore", "TextAnalyzer", "TextStats",
    "token_count_table", "approx_count_distinct", "approx_top_k",
    "estimate", "fold_batch",
    "session_window_agg", "sliding_window_agg",
]
