from youku_mplug_tpu.evals.meteor import Meteor, meteor_score
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
    "Meteor",
    "meteor_score",
    "topk_accuracy",
    "itm_eval",
    "normalize_chinese",
    "bleu",
    "rouge_l",
    "cider",
    "caption_eval",
]
