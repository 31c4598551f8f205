"""The driver's single-chip hook (__graft_entry__.entry) must stay
jittable: it is compile-checked by the round driver outside the test
suite, so a regression there would only surface at round end.  This
pins it in-suite on the CPU backend (the multi-chip dryrun is covered
separately by the driver's MULTICHIP artifact — too slow for the
suite).
"""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_entry_jits_and_runs():
    import __graft_entry__ as g

    fn, example_args = g.entry()
    scores, docs = jax.jit(fn)(*example_args)
    scores = np.asarray(scores)
    docs = np.asarray(docs)
    assert scores.shape == docs.shape == (16,)
    # a SHOULD query over the tiny corpus's three most common terms must
    # surface real hits: positive scores, valid in-range doc ids, and
    # the scores sorted descending (top-k contract)
    assert scores[0] > 0
    valid = scores > 0
    assert valid.any()
    assert (docs[valid] >= 0).all() and (docs[valid] < 64).all()
    s = scores[valid]
    assert (s[:-1] >= s[1:]).all()
