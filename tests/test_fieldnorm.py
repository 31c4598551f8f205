"""Fieldnorm byte-codec parity (Lucene SmallFloat scheme used by Tantivy)."""

import numpy as np

from fugu_tpu import fieldnorm


def test_exact_below_41():
    for n in range(41):
        fid = fieldnorm.fieldnorm_to_id(n)
        assert fieldnorm.id_to_fieldnorm(fid) == n


def test_truncation_not_rounding():
    # 41 is not representable: table has ... 40, 42 ... -> truncates down
    fid = fieldnorm.fieldnorm_to_id(41)
    assert fieldnorm.id_to_fieldnorm(fid) == 40


def test_table_monotone_and_256():
    t = fieldnorm.FIELD_NORMS_TABLE
    assert len(t) == 256
    assert np.all(np.diff(t) > 0)
    assert t[0] == 0 and t[23] == 23 and t[24] == 24


def test_roundtrip_idempotent():
    for n in [0, 1, 5, 40, 41, 100, 1000, 10_000, 1_000_000]:
        fid = fieldnorm.fieldnorm_to_id(n)
        dec = fieldnorm.id_to_fieldnorm(fid)
        assert dec <= n
        assert fieldnorm.fieldnorm_to_id(dec) == fid


def test_vectorized_matches_scalar():
    ns = np.array([0, 1, 39, 40, 41, 63, 64, 100, 5000, 123456])
    fids = fieldnorm.fieldnorms_to_ids(ns)
    for n, f in zip(ns, fids):
        assert f == fieldnorm.fieldnorm_to_id(int(n))
    back = fieldnorm.ids_to_fieldnorms(fids)
    for n, b in zip(ns, back):
        assert b == fieldnorm.id_to_fieldnorm(fieldnorm.fieldnorm_to_id(int(n)))


def test_arithmetic_decode_matches_table():
    fids = np.arange(256)
    assert np.array_equal(
        fieldnorm.decode_fid_arithmetic(fids), fieldnorm.FIELD_NORMS_TABLE
    )
