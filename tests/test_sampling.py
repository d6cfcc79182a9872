"""Tests for corpus-composition stages (sampling.py), the inverted-index
partial (text.token_df_batch), and the CMS exactness certificate."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_table(n=1000, seed=7):
    rng = np.random.default_rng(seed)
    langs = np.array(["en", "de", "fr", "es", "zh"])[rng.integers(0, 5, n)]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(langs.tolist(), pa.string()),
        }
    )


class TestTakePerGroup:
    def test_matches_row_number_reference(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from sprout_ray.stages.sampling import take_per_group

        t = _docs_table()
        ds = rd.from_arrow(t).repartition(7)  # force multi-block partials
        got = take_per_group(ds, "lang", "doc_id", quota=13).to_pandas()

        df = t.to_pandas().sort_values(["lang", "doc_id"])
        df["rn"] = df.groupby("lang").cumcount()
        want = df[df["rn"] < 13][["lang", "doc_id"]].reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)

    def test_dict_and_callable_quotas_agree(self, ray_session):
        import ray.data as rd

        from sprout_ray.stages.sampling import take_per_group

        ds = rd.from_arrow(_docs_table()).repartition(5)
        q = {"en": 3, "de": 0, "fr": 10, "es": 1, "zh": 5}
        a = take_per_group(ds, "lang", "doc_id", quota=q)
        b = take_per_group(ds, "lang", "doc_id", quota=lambda k: q[k])
        assert a.equals(b)
        # a stratum absent from the dict is dropped (quota 0), not an error
        c = take_per_group(ds, "lang", "doc_id", quota={"en": 3})
        assert set(c["lang"].to_pylist()) == {"en"} and c.num_rows == 3
        counts = {
            k: v
            for k, v in zip(*np.unique(a["lang"].to_numpy(zero_copy_only=False), return_counts=True))
        }
        assert counts == {k: v for k, v in q.items() if v > 0}

    def test_quota_larger_than_group(self, ray_session):
        import ray.data as rd

        from sprout_ray.stages.sampling import take_per_group

        t = pa.table(
            {"lang": pa.array(["en", "en", "de"]), "doc_id": pa.array([2, 1, 9], pa.int64())}
        )
        got = take_per_group(rd.from_arrow(t), "lang", "doc_id", quota=100)
        assert got["doc_id"].to_pylist() == [9, 1, 2]  # sorted by (lang, id)


class TestAssignSplit:
    FR = [("train", 0.8), ("val", 0.1), ("test", 0.1)]

    def test_split_cuts_quantization(self):
        from sprout_ray.stages.sampling import split_cuts

        assert split_cuts(self.FR, 10).tolist() == [8, 9, 10]
        assert split_cuts([("a", 0.5), ("b", 0.5)], 7).tolist() == [4, 7]
        with pytest.raises(ValueError):
            split_cuts([("a", 0.6), ("b", 0.6)], 10)
        with pytest.raises(ValueError):
            split_cuts([("a", -0.1), ("b", 1.1)], 10)

    def test_total_deterministic_and_blockcount_invariant(self, ray_session):
        import ray.data as rd

        from sprout_ray.stages.sampling import assign_split

        t = _docs_table(2000)
        a = assign_split(rd.from_arrow(t).repartition(3), "doc_id", self.FR).to_pandas()
        b = assign_split(rd.from_arrow(t).repartition(11), "doc_id", self.FR).to_pandas()
        a = a.sort_values("doc_id").reset_index(drop=True)
        b = b.sort_values("doc_id").reset_index(drop=True)
        assert (a["split"] == b["split"]).all()  # block-count invariant
        assert len(a) == 2000 and set(a["split"]) == {"train", "val", "test"}
        # proportions within 5-sigma binomial + quantization slack
        for name, frac in self.FR:
            obs = (a["split"] == name).mean()
            tol = 5 * np.sqrt(frac * (1 - frac) / 2000) + 1e-4
            assert abs(obs - frac) <= tol, (name, obs, frac)

    def test_mod_split_matches_case_expression(self, ray_session):
        import ray.data as rd

        from sprout_ray.stages.sampling import assign_split

        t = _docs_table(500)
        got = (
            assign_split(rd.from_arrow(t), "doc_id", self.FR, method="mod", buckets=10)
            .to_pandas()
            .sort_values("doc_id")
        )
        mod = got["doc_id"].to_numpy() % 10
        want = np.where(mod < 8, "train", np.where(mod == 8, "val", "test"))
        assert (got["split"].to_numpy() == want).all()

    def test_string_key_hash_split(self, ray_session):
        import ray.data as rd

        from sprout_ray.stages.sampling import assign_split

        t = _docs_table(300)
        out = assign_split(rd.from_arrow(t), "lang", self.FR).to_pandas()
        # same key -> same split, always
        assert out.groupby("lang")["split"].nunique().max() == 1

    def test_bad_method_rejected(self, ray_session):
        import ray.data as rd

        from sprout_ray.stages.sampling import assign_split

        with pytest.raises(ValueError):
            assign_split(rd.from_arrow(_docs_table(5)), "doc_id", self.FR, method="nope")


class TestTokenDF:
    def test_partial_matches_pandas_reference(self):
        from sprout_ray.stages.text import token_df_batch

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(["a b a", "  b  c ", "", "A a\tb"]),
            }
        )
        got = token_df_batch(t).to_pandas().set_index("token").sort_index()
        # tokens: doc0 {a:2, b:1}; doc1 {b:1, c:1}; doc2 {}; doc3 {a:2, b:1}
        assert got.loc["a", "tf"] == 4 and got.loc["a", "df"] == 2
        assert got.loc["b", "tf"] == 3 and got.loc["b", "df"] == 3
        assert got.loc["c", "tf"] == 1 and got.loc["c", "df"] == 1
        assert len(got) == 3  # empty doc contributes nothing

    def test_block_partials_sum_to_global(self, ray_session):
        import duckdb
        import ray.data as rd

        from sprout_ray.stages.text import token_df_batch

        rng = np.random.default_rng(3)
        words = np.array(["alpha", "beta", "gamma", "delta", "epsilon"])
        texts = [" ".join(words[rng.integers(0, 5, rng.integers(1, 12))]) for _ in range(400)]
        t = pa.table(
            {"doc_id": pa.array(np.arange(400, dtype=np.int64)), "text": pa.array(texts)}
        )
        parts = rd.from_arrow(t).repartition(9).map_batches(
            token_df_batch, batch_format="pyarrow"
        )
        got = (
            parts.groupby("token").sum(["df", "tf"]).to_pandas()
            .rename(columns={"sum(df)": "df", "sum(tf)": "tf"})
            .sort_values("token").reset_index(drop=True)
        )
        want = duckdb.sql(
            "WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text, ' ')), '\\s+')) AS token "
            "FROM t) SELECT token, count(DISTINCT doc_id) AS df, count(*) AS tf "
            "FROM toks WHERE token <> '' GROUP BY token ORDER BY token"
        ).df()
        assert got["token"].tolist() == want["token"].tolist()
        assert (got["df"].to_numpy() == want["df"].to_numpy()).all()
        assert (got["tf"].to_numpy() == want["tf"].to_numpy()).all()


class TestCMSCertificate:
    def test_certificate_implies_exact(self):
        from sprout_ray.kernel.countmin import CountMinSketch

        rng = np.random.default_rng(11)
        keys = [f"key-{i}".encode() for i in range(40)]
        counts = rng.integers(1, 1000, 40)
        cms = CountMinSketch(eps=0.001, delta=0.01)
        cms.update_batch(keys, counts)
        cert = cms.collision_free(keys)
        assert cert.all()  # w=2719, 40 keys: uncontended row certain
        est = cms.query_batch(keys)
        assert (est == counts.astype(np.uint64)).all()

    def test_certificate_fails_under_crowding(self):
        from sprout_ray.kernel.countmin import CountMinSketch

        cms = CountMinSketch(eps=0.5, delta=0.5)  # w=6, d=1
        keys = [f"k{i}".encode() for i in range(50)]
        cert = cms.collision_free(keys)
        assert not cert.all()  # 50 keys into 6 buckets must collide

    def test_empty_universe(self):
        from sprout_ray.kernel.countmin import CountMinSketch

        cms = CountMinSketch()
        assert cms.collision_free([]).shape == (0,)


class TestShuffleByHash:
    def test_permutation_matches_numpy_reference(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from sprout_ray.stages.sampling import shuffle_by_hash

        ids = np.arange(1000, dtype=np.int64)
        ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids)})).repartition(5)
        got = shuffle_by_hash(ds, "doc_id").to_pandas()["doc_id"].to_numpy()
        key = (((ids + 0) % (1 << 31)) * 2654435761) % (1 << 32)
        want = ids[np.lexsort((ids, key))]
        assert (got == want).all()
        assert sorted(got.tolist()) == ids.tolist()  # a true permutation

    def test_seed_changes_order(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from sprout_ray.stages.sampling import shuffle_by_hash

        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array(np.arange(500, dtype=np.int64))})
        )
        a = shuffle_by_hash(ds, "doc_id", seed=0).to_pandas()["doc_id"]
        b = shuffle_by_hash(ds, "doc_id", seed=12345).to_pandas()["doc_id"]
        assert a.tolist() != b.tolist()

    def test_negative_ids_raise(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from sprout_ray.stages.sampling import shuffle_by_hash

        ds = rd.from_arrow(pa.table({"doc_id": pa.array([-1, 2], pa.int64())}))
        import pytest as _pt

        with _pt.raises(Exception):
            shuffle_by_hash(ds, "doc_id").to_pandas()


class TestSamplePerGroup:
    def test_mod_matches_reference_and_hash_proportions(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from sprout_ray.stages.sampling import sample_per_group

        n = 4000
        ids = np.arange(n, dtype=np.int64)
        langs = np.array(["en", "de", "fr", "xx"])[ids % 4]
        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array(ids), "lang": pa.array(langs)})
        ).repartition(4)
        rates = {"en": 0.5, "de": 1.0, "fr": 0.0}  # xx absent -> dropped
        # mod path: exact set predicted by the formula
        got = sample_per_group(
            ds, "lang", rates, method="mod", buckets=1000
        ).to_pandas()
        want = {
            int(i)
            for i in ids
            if (i % 1000) < round(rates.get(langs[i], 0.0) * 1000)
        }
        assert set(got["doc_id"]) == want
        assert set(got.loc[got["lang"] == "fr"].index) == set()
        # hash path: proportions within 5 sigma per stratum, rerun-stable
        h1 = sample_per_group(ds, "lang", rates, method="hash").to_pandas()
        h2 = sample_per_group(ds, "lang", rates, method="hash").to_pandas()
        assert h1["doc_id"].tolist() == h2["doc_id"].tolist()
        for lang, rate in rates.items():
            kept = (h1["lang"] == lang).sum()
            total = (langs == lang).sum()
            sigma = max((total * rate * (1 - rate)) ** 0.5, 1.0)
            assert abs(kept - total * rate) <= 5 * sigma + total / 1000

    def test_flat_rate_and_callable(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from sprout_ray.stages.sampling import sample_per_group

        ids = np.arange(1000, dtype=np.int64)
        ds = rd.from_arrow(
            pa.table(
                {"doc_id": pa.array(ids), "lang": pa.array(["en"] * 1000)}
            )
        )
        all_rows = sample_per_group(ds, "lang", 1.0, method="mod", buckets=10)
        assert all_rows.count() == 1000
        none = sample_per_group(ds, "lang", lambda k: 0.0, method="mod")
        assert none.count() == 0


class TestPercentileBandFilter:
    def test_matches_numpy_percentile_disc(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from sprout_ray.stages.sampling import percentile_band_filter

        rng = np.random.default_rng(5)
        langs = np.array(["en", "de", "fr"])[rng.integers(0, 3, 2000)]
        vals = rng.integers(0, 300, 2000).astype(np.int64)
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(np.arange(2000, dtype=np.int64)),
                    "lang": pa.array(langs),
                    "n": pa.array(vals),
                }
            )
        ).repartition(6)
        out, bands = percentile_band_filter(ds, "lang", "n", 0.125, 0.875)
        got = out.to_pandas()

        def disc(v, q):
            v = np.sort(v)
            return int(v[max(int(np.ceil(q * len(v))), 1) - 1])

        for lang in ["en", "de", "fr"]:
            v = vals[langs == lang]
            lo, hi = disc(v, 0.125), disc(v, 0.875)
            assert bands[lang] == (lo, hi)
            kept = got.loc[got["lang"] == lang, "n"].to_numpy()
            want = v[(v >= lo) & (v <= hi)]
            assert sorted(kept.tolist()) == sorted(want.tolist())

    def test_bad_quantiles_raise(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from sprout_ray.stages.sampling import percentile_band_filter

        ds = rd.from_arrow(
            pa.table({"lang": ["en"], "n": pa.array([1], pa.int64())})
        )
        import pytest as _pt

        with _pt.raises(ValueError):
            percentile_band_filter(ds, "lang", "n", 0.9, 0.1)

    def test_histogram_budget_guard(self, ray_session):
        """A wide-range value column (every value distinct) must fail LOUDLY
        at the driver-reduce budget instead of silently collecting the
        |keys| x |distinct values| histogram."""
        import numpy as np
        import pyarrow as pa
        import pytest as _pt
        import ray.data as rd

        from sprout_ray.stages.sampling import percentile_band_filter

        ds = rd.from_arrow(
            pa.table(
                {
                    "lang": pa.array(["en"] * 500),
                    # 500 distinct values — a stand-in for timestamps/hashes
                    "n": pa.array(np.arange(500, dtype=np.int64) * 7919),
                }
            )
        ).repartition(4)
        with _pt.raises(ValueError, match="max_hist_rows"):
            percentile_band_filter(ds, "lang", "n", 0.05, 0.95, max_hist_rows=100)
        # at/under the budget the same input succeeds
        out, bands = percentile_band_filter(
            ds, "lang", "n", 0.05, 0.95, max_hist_rows=500
        )
        assert set(bands) == {"en"}
        assert out.count() > 0


class TestWeightedSample:
    def _naive(self, ids, w, n, seed=0):
        h = (((ids + seed) % (1 << 31)) * 2654435761) % (1 << 32)
        s = np.log((h + 1.0) / float(1 << 32)) / w.astype(np.float64)
        order = np.lexsort((ids, -s))
        return ids[order[:n]].tolist()

    def test_matches_naive_and_partition_invariant(self, ray_session):
        import ray.data as rd

        from sprout_ray.stages.sampling import weighted_sample

        rng = np.random.default_rng(2)
        ids = np.arange(500, dtype=np.int64)
        w = rng.integers(1, 400, 500).astype(np.int64)
        tab = pa.table({"doc_id": pa.array(ids), "w": pa.array(w)})
        want = self._naive(ids, w, 25)
        for parts in (1, 8):
            ds = rd.from_arrow(tab).repartition(parts)
            got = (
                weighted_sample(ds, 25, weight_col="w")
                .to_pandas()["doc_id"]
                .tolist()
            )
            assert got == want, parts

    def test_weight_bias(self, ray_session):
        """An item with overwhelming weight is (near-)always selected."""
        import ray.data as rd

        from sprout_ray.stages.sampling import weighted_sample

        ids = np.arange(200, dtype=np.int64)
        w = np.ones(200, np.int64)
        w[123] = 1_000_000
        ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids), "w": pa.array(w)}))
        hits = 0
        for seed in range(10):
            got = weighted_sample(ds, 10, weight_col="w", seed=seed).to_pandas()
            hits += int(123 in set(got["doc_id"]))
        assert hits >= 9  # P(miss) per draw < (190/200)^... astronomically small

    def test_guards(self, ray_session):
        import pytest as _pt
        import ray.data as rd

        from sprout_ray.stages.sampling import weighted_sample

        bad = rd.from_arrow(
            pa.table({"doc_id": pa.array([1], pa.int64()), "w": pa.array([0], pa.int64())})
        )
        with _pt.raises(Exception, match="strictly positive"):
            weighted_sample(bad, 1, weight_col="w").materialize()
        with _pt.raises(ValueError, match="n must be"):
            weighted_sample(bad, 0, weight_col="w")
