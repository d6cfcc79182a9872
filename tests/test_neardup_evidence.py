"""Round-5 VERDICT #5: the three no_oracle near-dup estimator queries
self-certify in-band (est vs an independently recomputed exact value +
bound flag), so the driver's rows-only rows carry their own evidence.
Row identity (left_id/right_id and the original estimate columns) is
unchanged vs round 4 — only evidence columns were appended.
"""

import pytest

import sprout_ray.pipelines.analytics as A

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def _pdf(t):
    return t.to_pandas() if hasattr(t, "to_pandas") else t


def test_minhash_neardup_self_certifies():
    t = _pdf(A.minhash_neardup(SF))
    assert list(t.columns) == [
        "left_id", "right_id", "est_jaccard",
        "exact_jaccard", "abs_err", "within_bound",
    ]
    assert len(t) == 25  # round-4 driver row count preserved
    assert t["within_bound"].all()
    # the signature estimate tracks the true shingle Jaccard tightly
    assert (t["exact_jaccard"] >= 0.6).all()
    assert float(t["abs_err"].max()) < 0.12


def test_simhash_neardup_self_certifies():
    t = _pdf(A.simhash_neardup(SF))
    assert list(t.columns) == [
        "left_id", "right_id", "hamming",
        "exact_cos", "est_angle_frac", "within_bound",
    ]
    assert len(t) == 18
    assert t["within_bound"].all()
    # hamming <= 3 pairs are overwhelmingly near-identical token vectors;
    # the few lower-cosine candidates (min ~0.82 on this corpus) are the
    # estimator's false-positive tail — precisely what the evidence
    # columns exist to expose, and their binomial bounds still hold
    assert (t["exact_cos"] > 0.7).all()
    assert float(t["exact_cos"].median()) > 0.97


def test_embedding_neardup_self_certifies():
    t = _pdf(A.embedding_neardup(SF))
    assert list(t.columns) == [
        "left_id", "right_id", "cosine",
        "exact_cos64", "abs_err", "within_bound",
    ]
    assert len(t) == 1
    assert t["within_bound"].all()
    # float32 fused verify vs independent float64 recompute
    assert float(t["abs_err"].max()) < 5e-3


def test_evidence_gate_is_loud():
    """The driver-side evidence collection is verification-scale: past the
    pair gate it must refuse with a pointer to the streaming stage API."""
    from sprout_ray.pipelines.analytics import _evidence_gate

    _evidence_gate(250_000, "q", "api")
    with pytest.raises(ValueError, match="streaming"):
        _evidence_gate(250_001, "q", "api")
