from .numeric import exact_sum, exact_avg
from .text import (
    nonempty_tokens,
    token_count_ws,
    token_count_bpe,
    fingerprint_md5,
    lang_id_expr,
    quality_score_cols,
)

__all__ = [
    "exact_sum",
    "exact_avg",
    "nonempty_tokens",
    "token_count_ws",
    "token_count_bpe",
    "fingerprint_md5",
    "lang_id_expr",
    "quality_score_cols",
]
