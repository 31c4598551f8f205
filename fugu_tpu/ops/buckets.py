"""Static-shape bucketing policy.

Everything under ``jit`` must have static shapes; query postings don't.
We bucket the three degrees of freedom — clause count T, longest posting
window L, total entry count E — to a small fixed ladder so the number of
distinct compiled programs stays bounded (SURVEY.md §7 "Dynamic-shape
postings vs static-shape kernels").
"""

from __future__ import annotations

from typing import Sequence

T_BUCKETS = (1, 2, 4, 8, 16, 32, 64)
# lane-aligned (multiples of 128) posting-window ladder, ~4x steps
L_BUCKETS = (128, 512, 2048, 8192, 32768, 131072, 524288, 2097152, 8388608)
K_BUCKETS = (16, 64, 256, 1024, 4096)


def bucket(value: int, ladder: Sequence[int]) -> int:
    for b in ladder:
        if value <= b:
            return b
    return ladder[-1]


def t_bucket(n_terms: int) -> int:
    return bucket(max(n_terms, 1), T_BUCKETS)


def l_bucket(max_len: int) -> int:
    return bucket(max(max_len, 1), L_BUCKETS)


def e_bucket(total: int) -> int:
    return bucket(max(total, 1), L_BUCKETS)


def k_bucket(k: int) -> int:
    return bucket(max(k, 1), K_BUCKETS)
