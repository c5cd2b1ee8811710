from youku_mplug_tpu.evals.metrics import (
    topk_accuracy,
    itm_eval,
    normalize_chinese,
    bleu,
    rouge_l,
    cider,
    caption_eval,
)

__all__ = [
    "topk_accuracy",
    "itm_eval",
    "normalize_chinese",
    "bleu",
    "rouge_l",
    "cider",
    "caption_eval",
]
