"""Static-shape bucketing policy.

Everything under ``jit`` must have static shapes; query postings don't.
We bucket the degrees of freedom — clause count T, longest posting
window L, total entry count E, result size K, and query batch size B —
to small fixed ladders so the number of distinct compiled programs stays
bounded (SURVEY.md §7 "Dynamic-shape postings vs static-shape kernels").
The ladders are deliberately coarse: on this stack each new program
costs ~O(minutes) of (remote) XLA compilation, so fewer/larger buckets
beat tighter padding.
"""

from __future__ import annotations

from typing import Sequence

T_BUCKETS = (1, 4, 16, 64)
# posting-window ladder (lane-aligned), coarse ~16x steps
L_BUCKETS = (512, 8192, 131072, 2097152, 8388608)
# total-entries ladder gets intermediate rungs (sums of several windows)
E_BUCKETS = (512, 8192, 32768, 131072, 524288, 2097152, 8388608, 33554432)
K_BUCKETS = (16, 256, 4096)
B_BUCKETS = (1, 8, 64, 128)


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
    return bucket(max(total, 1), E_BUCKETS)


def k_bucket(k: int) -> int:
    return bucket(max(k, 1), K_BUCKETS)


def b_bucket(n: int) -> int:
    return bucket(max(n, 1), B_BUCKETS)
