"""Semantic checks for the pre-training corpus-preparation operators
(operators/pretrain.py) beyond the driver's value-hash oracle compare:
the redaction actually removes every match, chunking tiles the token
stream with the declared overlap, mixing hits its per-stratum rates, and
packing conserves tokens with capacity-aligned bin starts.
"""

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extractor_spark.operators.pretrain import (
    _BIN_TOKENS,
    _CHUNK,
    _N_BUCKETS,
    _PII_EMAIL,
    _PII_IP,
    _PII_PHONE,
    _STRIDE,
    q_chunk_tokens,
    q_domain_mix,
    q_pack_sequences,
    q_pii_scrub,
)


class TestPiiScrub:
    def test_every_doc_has_injected_pii_counted(self, spark, sf_dir):
        rows = q_pii_scrub(spark, sf_dir).collect()
        assert rows
        # the gate injects exactly one of each class per doc; natural text
        # may add more but never fewer
        assert all(r.n_email >= 1 and r.n_phone >= 1 and r.n_ip >= 1
                   for r in rows)

    def test_redacted_text_has_no_residual_matches(self, spark, sf_dir):
        # recompute redaction locally on a sample and scan with the SAME
        # patterns: nothing may survive the scrub
        import pyspark.sql.functions as F

        from pdf_extractor_spark.operators.pretrain import _PII_AUG_SQL
        from pdf_extractor_spark.operators.registry import T

        d = T(spark, sf_dir, "documents").where(F.col("text").isNotNull())
        aug = d.select(F.expr(_PII_AUG_SQL).alias("aug")).limit(50).collect()
        for r in aug:
            red = re.sub(_PII_EMAIL, "<EMAIL>", r.aug)
            red = re.sub(_PII_IP, "<IP>", red)
            red = re.sub(_PII_PHONE, "<PHONE>", red)
            for pat in (_PII_EMAIL, _PII_PHONE, _PII_IP):
                assert re.search(pat, red) is None


class TestChunkTokens:
    def test_chunks_tile_with_declared_stride(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from pdf_extractor_spark.operators.registry import T

        out = q_chunk_tokens(spark, sf_dir)
        per_doc = {
            r.doc_id: (r.n, r.mx)
            for r in out.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.max("chunk_id").alias("mx")).collect()
        }
        toks = {
            r.doc_id: r.nt
            for r in T(spark, sf_dir, "documents")
            .where(F.trim("text") != "")
            .select("doc_id",
                    F.size(F.split(F.trim("text"), r"\s+")).alias("nt"))
            .collect()
        }
        assert set(per_doc) == set(toks)
        for doc_id, (n, mx) in per_doc.items():
            nt = toks[doc_id]
            want = 1 if nt <= _CHUNK else 1 + -(-(nt - _CHUNK) // _STRIDE)
            assert n == want and mx == want - 1
            # stride < chunk -> every token is covered by some window
            assert (want - 1) * _STRIDE + _CHUNK >= nt

    def test_chunk_sizes_bounded(self, spark, sf_dir):
        sizes = [r.n_chunk_tokens
                 for r in q_chunk_tokens(spark, sf_dir).collect()]
        assert sizes and all(1 <= s <= _CHUNK for s in sizes)


class TestDomainMix:
    def test_kept_fraction_tracks_stratum_rate(self, spark):
        # sf0.01 has 500 docs -> 25 per stratum, too few for a tight bound;
        # rates are checked corpus-wide per rate-class instead
        rows = q_domain_mix(spark, "/root/testdata/sf0.01").collect()
        by_rate: dict[int, list] = {0: [], 1: [], 2: [], 3: []}
        for r in rows:
            by_rate[int(r.source[3:]) % 4].append(r)
        for idx, grp in by_rate.items():
            rate = (idx + 1) * 0.2
            kept = sum(r.n_kept for r in grp)
            total = sum(r.n_total for r in grp)
            assert abs(kept / total - rate) < 0.15, (idx, kept, total)

    def test_membership_is_deterministic(self, spark, sf_dir):
        a = {(r.source, r.n_kept) for r in q_domain_mix(spark, sf_dir).collect()}
        b = {(r.source, r.n_kept) for r in q_domain_mix(spark, sf_dir).collect()}
        assert a == b


class TestPackSequences:
    def test_tokens_conserved_and_bins_contiguous(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from pdf_extractor_spark.operators.registry import T

        rows = q_pack_sequences(spark, sf_dir).collect()
        trimmed = F.trim("text")
        total = (
            T(spark, sf_dir, "documents")
            .where(F.col("text").isNotNull())
            .select(F.when(trimmed == "", 0)
                    .otherwise(F.size(F.split(trimmed, r"\s+")))
                    .alias("nt"))
            .agg(F.sum("nt")).collect()[0][0]
        )
        assert sum(r.n_tokens for r in rows) == total
        assert {r.bucket for r in rows} <= set(range(_N_BUCKETS))

    def test_matches_independent_python_packing(self, spark, sf_dir):
        # reimplement the pack from scratch (stdlib only) over the raw
        # parquet and require exact (bucket, bin) -> (n_docs, n_tokens)
        # equality with the Spark plan
        import duckdb

        con = duckdb.connect()
        docs = con.sql(
            f"SELECT doc_id, text FROM read_parquet("
            f"'{sf_dir}/documents.parquet') "
            f"WHERE text IS NOT NULL ORDER BY doc_id").fetchall()
        want: dict[tuple[int, int], list[int]] = {}
        cum: dict[int, int] = {}
        for doc_id, text in docs:
            n_tok = len(text.split()) if text.strip() else 0
            bucket = doc_id % _N_BUCKETS
            start = cum.get(bucket, 0)
            cum[bucket] = start + n_tok
            key = (bucket, start // _BIN_TOKENS)
            agg = want.setdefault(key, [0, 0])
            agg[0] += 1
            agg[1] += n_tok
        got = {(r.bucket, r.bin_id): [r.n_docs, r.n_tokens]
               for r in q_pack_sequences(spark, sf_dir).collect()}
        assert got == want


class TestUnicodeNorm:
    def test_changed_flag_follows_bank(self, spark, sf_dir):
        # documents text is NFC-stable (extracted ASCII/latin-1 English), so
        # `changed` is decided entirely by the bank suffix: entries 0 and 7
        # are NFC-stable, 1-6 are decomposed/singleton forms that normalize
        from pdf_extractor_spark.operators.pretrain import q_unicode_norm

        rows = q_unicode_norm(spark, sf_dir).collect()
        assert rows
        for r in rows:
            expected = 0 if r.doc_id % 8 in (0, 7) else 1
            assert r.changed == expected, (r.doc_id, r.changed)

    def test_matches_stdlib_nfc(self, spark, sf_dir):
        # independent recompute: read the parquet directly, apply the same
        # augmentation in Python, normalize with unicodedata, compare md5
        import hashlib
        import unicodedata

        import duckdb

        from pdf_extractor_spark.operators.pretrain import (
            _NFC_BANK,
            q_unicode_norm,
        )

        got = {r.doc_id: r.nfc_md5
               for r in q_unicode_norm(spark, sf_dir).collect()}
        docs = duckdb.sql(
            f"select doc_id, text from "
            f"read_parquet('{sf_dir}/documents.parquet') "
            f"where trim(text) <> ''"
        ).fetchall()
        assert len(docs) == len(got)
        for doc_id, text in docs:
            aug = text.strip() + " " + _NFC_BANK[doc_id % 8]
            norm = unicodedata.normalize("NFC", aug)
            exp = hashlib.md5(norm.encode("utf-8")).hexdigest()
            assert got[doc_id] == exp, doc_id


class TestHashEmbed:
    def test_conserves_tokens_and_matches_stdlib(self, spark, sf_dir):
        # per-doc sum of dimension counts == word count, and every vector
        # equals a pure-Python hashing-trick recompute over the raw parquet
        import hashlib
        import re as _re
        from collections import Counter

        import duckdb

        from pdf_extractor_spark.operators.similarity import (
            _EMBED_DIMS,
            q_hash_embed,
        )

        vecs: dict[int, dict[int, int]] = {}
        for r in q_hash_embed(spark, sf_dir).collect():
            vecs.setdefault(r.doc_id, {})[r.dim] = r.cnt
        docs = duckdb.sql(
            f"select doc_id, text from "
            f"read_parquet('{sf_dir}/documents.parquet') "
            f"where trim(text) <> ''"
        ).fetchall()
        assert len(docs) == len(vecs)
        for doc_id, text in docs:
            words = [w for w in _re.split(r"\s+", text.strip().lower()) if w]
            exp = Counter(
                int(hashlib.md5(w.encode()).hexdigest()[30:32], 16)
                % _EMBED_DIMS
                for w in words
            )
            v = vecs[doc_id]
            assert len(v) == _EMBED_DIMS          # dense: all dims present
            assert sum(v.values()) == len(words)  # token conservation
            assert {d: c for d, c in v.items() if c} == dict(exp), doc_id
