"""Multimodal column operators — opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is a
deterministic stand-in (clearly marked below); everything Spark-side is
real and tested: binary column construction, Arrow-batched mapInPandas
plumbing (schema, batch shape, multi-row yield), and metadata
extraction. Payloads are the UTF-8 bytes of ``documents.text`` — at
production scale they'd be image/audio/video blobs read from parquet
binary columns, and ONLY ``_decode_payload`` changes.

Scale posture:
- Metadata extraction is pure JVM expressions (octet_length, md5) — no
  Python in that path at all.
- Feature extraction crosses to Python exactly once, via mapInPandas
  (Arrow batches, vectorized numpy inside) — the sanctioned pattern for
  binary decode at 100 TB: one pass, no shuffle, batch-at-a-time
  memory.
- Frame sampling yields a variable number of rows per input row —
  mapInPandas (not a scalar pandas_udf) because the cardinality
  changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_to_parquet_spark.operators import Catalog
from csv_to_parquet_spark.sources.tables import load_table, spread

CAT = Catalog()

_FRAME_LEN, _FRAME_STRIDE = 32, 64


def _decode_payload(payload: bytes) -> dict:
    """STUB for the real decoder. A production build would do, e.g.::

        from PIL import Image          # not installed in this container
        img = Image.open(io.BytesIO(payload))
        return {"width": img.width, "height": img.height, ...}

    Here: deterministic pseudo-features of the raw bytes so results are
    stable and oracle-checkable. Real codec integration replaces this
    one function; every Spark-side contract stays identical.
    """
    try:
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real image decode is intentionally not wired up in this container"
        )
    except ImportError:
        pass
    import numpy as np

    n = len(payload)
    return {
        "n_bytes": n,
        # vectorized byte sum — a pure-Python sum() over bytes was the
        # batch bottleneck at bench scale
        "checksum": int(np.frombuffer(payload, dtype=np.uint8).sum()) % 2_147_483_647,
        # fake "dimensions" derived deterministically from the payload
        "width": (n % 64) + 1,
        "height": (n // 64) + 1,
    }


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text → opaque binary payload column + typed metadata.
    Spread across cores: mapInPandas parallelism == partition count,
    and the source is a single file."""
    return spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


@CAT.query(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5,
           'application/octet-stream' AS mime
    FROM documents
    """,
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column — pure JVM path
    (octet_length/md5 on binary), zero Python, zero shuffle."""
    p = _payloads(spark, sf_dir)
    return p.select(
        "doc_id",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        "mime",
    )


@CAT.query(
    "mm_image_features_stub",
    oracle="""
    WITH b AS (
      SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n,
             list_sum(list_transform(split(text, ''), x -> ord(x))) AS bytesum
      FROM documents)
    SELECT doc_id, n AS n_bytes,
           CAST(bytesum % 2147483647 AS BIGINT) AS checksum,
           CAST((n % 64) + 1 AS BIGINT) AS width,
           CAST((n // 64) + 1 AS BIGINT) AS height
    FROM b
    """,
)
def mm_image_features_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through Arrow-batched mapInPandas: the real
    decode boundary (stubbed — see _decode_payload). The oracle can
    mirror the fake features because the corpus is ASCII (byte == char);
    with real codecs this entry degrades to a rows-only check."""
    schema = "doc_id BIGINT, n_bytes BIGINT, checksum BIGINT, width BIGINT, height BIGINT"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_payload(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[["doc_id", "n_bytes", "checksum", "width", "height"]]

    return _payloads(spark, sf_dir).mapInPandas(extract, schema)


@CAT.query(
    "mm_resize_stub",
    oracle="""
    WITH d AS (SELECT doc_id, text, strlen(text) AS n FROM documents
               WHERE strlen(text) >= 64),
    px AS (SELECT doc_id,
                  unnest(range(0, 8)) AS ry,
                  text, n
           FROM d)
    SELECT doc_id, CAST(ry AS BIGINT) AS row_idx,
           CAST(list_sum([ord(substring(text, ry * 8 + x + 1, 1))
                          for x in range(0, 8)]) AS BIGINT) AS row_sum
    FROM px
    """,
)
def mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Resize" through the stubbed decoder: treat the first 64 payload
    bytes as an 8×8 image and emit per-row pixel sums (a real resize
    kernel replaces the numpy body; batch shape and schema are what a
    thumbnail pipeline needs). ASCII corpus → byte == char, so the
    oracle recomputes the same sums from the text."""
    schema = "doc_id BIGINT, row_idx BIGINT, row_sum BIGINT"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: list[tuple[int, int, int]] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if len(b) < 64:
                    continue
                img = np.frombuffer(b[:64], dtype=np.uint8).reshape(8, 8)
                for ry, s in enumerate(img.sum(axis=1, dtype=np.int64)):
                    out.append((doc_id, ry, int(s)))
            yield pd.DataFrame(out, columns=["doc_id", "row_idx", "row_sum"])

    return _payloads(spark, sf_dir).mapInPandas(resize, schema)


@CAT.query(
    "mm_frame_sample",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, strlen(text) AS n FROM documents
               WHERE strlen(text) >= {_FRAME_LEN}),
    f AS (SELECT doc_id, text,
                 unnest(range(0, ((n - {_FRAME_LEN}) // {_FRAME_STRIDE}) + 1)) AS i
          FROM d)
    SELECT doc_id,
           CAST(i AS BIGINT) AS frame_idx,
           md5(substring(text, i * {_FRAME_STRIDE} + 1, {_FRAME_LEN})) AS frame_md5
    FROM f
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling from an opaque "video" payload: mapInPandas yields
    a VARIABLE number of rows per input (every {stride}-offset
    {len}-byte window) — the batch-shape contract a real frame decoder
    needs. Frame hashes are md5 so the oracle verifies exact bytes."""
    schema = "doc_id BIGINT, frame_idx BIGINT, frame_md5 STRING"

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out: list[tuple[int, int, str]] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for idx in range((len(b) - _FRAME_LEN) // _FRAME_STRIDE + 1):
                    chunk = b[idx * _FRAME_STRIDE : idx * _FRAME_STRIDE + _FRAME_LEN]
                    if len(chunk) == _FRAME_LEN:
                        out.append(
                            (doc_id, idx, hashlib.md5(chunk).hexdigest())
                        )
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame_md5"])

    return _payloads(spark, sf_dir).mapInPandas(frames, schema)


_AUDIO_FRAME = 16  # samples per energy frame


@CAT.query(
    "mm_audio_energy_stub",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, strlen(text) // 2 AS ns FROM documents
               WHERE strlen(text) // 2 >= {_AUDIO_FRAME}),
    f AS (SELECT doc_id, text,
                 unnest(range(0, ns // {_AUDIO_FRAME})) AS j
          FROM d)
    SELECT doc_id, CAST(j AS BIGINT) AS frame_idx,
           CAST(list_sum(
             [power(ord(substring(text, (j * {_AUDIO_FRAME} + k) * 2 + 1, 1)) +
                    256 * ord(substring(text, (j * {_AUDIO_FRAME} + k) * 2 + 2, 1)),
                    2)
              for k in range(0, {_AUDIO_FRAME})]) AS BIGINT) AS energy
    FROM f
    """,
)
def mm_audio_energy_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame audio energy through the stubbed decoder: the payload
    is read as unsigned 16-bit little-endian samples, windowed into
    16-sample frames, and each frame emits the sum of squared samples
    — the loudness/VAD feature an audio ingest pipeline computes
    before segment filtering. A real build swaps the sample decode for
    the codec (soundfile/ffmpeg, absent in this container); the
    mapInPandas contract — variable rows per input, vectorized numpy
    per batch, int64 energies — is the production shape. ASCII corpus
    → byte == char, so the oracle recomputes identical samples from
    the text."""
    schema = "doc_id BIGINT, frame_idx BIGINT, energy BIGINT"

    def energies(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: list[tuple[int, int, int]] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                ns = len(b) // 2
                nf = ns // _AUDIO_FRAME
                if nf == 0:
                    continue
                raw = np.frombuffer(
                    b[: nf * _AUDIO_FRAME * 2], dtype=np.uint8
                ).astype(np.int64)
                samples = raw[0::2] + 256 * raw[1::2]
                frames = samples.reshape(nf, _AUDIO_FRAME)
                for j, e in enumerate((frames * frames).sum(axis=1)):
                    out.append((doc_id, j, int(e)))
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "energy"])

    return _payloads(spark, sf_dir).mapInPandas(energies, schema)


@CAT.query(
    "mm_payload_dedup",
    oracle="""
    WITH p AS (
      SELECT doc_id, md5(text) AS payload_md5,
             CAST(strlen(text) AS BIGINT) AS n_bytes
      FROM documents)
    SELECT payload_md5,
           MIN(doc_id) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(MIN(n_bytes) AS BIGINT) AS n_bytes,
           CAST((COUNT(*) - 1) * MIN(n_bytes) AS BIGINT)
             AS reclaimable_bytes
    FROM p GROUP BY payload_md5
    """,
)
def mm_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over OPAQUE binary payloads — the multimodal
    counterpart of ``dedup_exact_documents``: images/audio/video
    dedupe on content bytes before any decode (the same blob arrives
    via many crawl paths), and at 100 TB the reclaimable-bytes column
    is the storage-bill argument for running it. No codec involved,
    so unlike the feature stubs this entry is fully real: md5 over
    the binary column is a JVM-side projection, and the one shuffle
    carries (16-byte digest, doc_id, length) — payload bytes NEVER
    move. Production variant: store payloads content-addressed by
    this digest and the dedup is a directory listing.

    (Perceptual near-dup — pHash over decoded pixels — needs the
    codec and belongs with the mapInPandas stubs; byte-exact dedup
    deliberately does not.)"""
    p = _payloads(spark, sf_dir)
    return (
        p.select(
            "doc_id",
            F.md5("payload").alias("payload_md5"),
            F.octet_length("payload").cast("bigint").alias("n_bytes"),
        )
        .groupBy("payload_md5")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("n_bytes").cast("bigint").alias("n_bytes"),
            ((F.count(F.lit(1)) - 1) * F.min("n_bytes"))
            .cast("bigint")
            .alias("reclaimable_bytes"),
        )
    )


# ---------------------------------------------------------------------------
# Perceptual-hash near-duplicate pairs (pHash over the stub decode)
# ---------------------------------------------------------------------------

#: Max Hamming distance for a reported near-dup pair. The 4-way band
#: split below is LOSSLESS for this radius: two 64-bit hashes within
#: Hamming 3 differ in at most 3 of the 4 disjoint 16-bit bands, so at
#: least one band matches exactly (pigeonhole) — band-bucket joining
#: never misses a qualifying pair.
_PHASH_MAX_HAMMING = 3
_PHASH_BANDS = 4
_PHASH_TILE = 32  # decode target: 32x32 "luma" tile, classic pHash


def _phash_kernel(batches):
    """mapInPandas kernel: payload bytes → 64-bit perceptual hash.

    Stub decode (same contract as :func:`_decode_payload`): the
    payload is reduced to a CONTENT-ROBUST 32×32 feature tile — a
    hashed token histogram (crc32(token) mod 1024 counts). A real
    build swaps ONLY that step for a codec + grayscale resize; what
    must be preserved is the perceptual-hash contract that small
    perturbations of the decoded content move the tile only slightly.
    (The r6 kernel tiled RAW BYTES in stream order, which is
    edit-POSITION-sensitive — a one-word edit shifted every later
    byte and scrambled the whole tile, so re-encoded/perturbed
    payloads never matched and the operator returned 0 rows on
    fixtures without byte-identical dupes. A real image pHash is
    robust to exactly those perturbations; the histogram tile
    restores that property for byte payloads.)

    The hash itself is the classic pHash pipeline run in FIXED POINT:
    orthonormal DCT-II matrix scaled by 1e4 and rounded to int64, two
    integer matmuls (|d| ≤ 1e8·n·max_count — comfortably int64 for
    payloads to ~100 GB), keep the top-left 8×8 coefficient block,
    threshold each coefficient at the block median → 64 bits. Integer
    end to end ⇒ the same payload hashes identically on every run,
    partition order, and platform (float DCT would round differently
    under different BLAS kernels) — and since r9 every stage is also
    SQL-expressible (token buckets via md5_60, replacing crc32 which
    DuckDB lacks; the fixed-point DCT rows ship as literals), so the
    entry carries a full DuckDB oracle instead of a rows-only check.
    Tokens split on the RE2 ``\\s`` class ([\\t\\n\\f\\r ]) to match
    the oracle's regexp_split exactly (bytes.split() also breaks on
    \\x0b, which RE2 \\s does not).
    """
    import hashlib
    import re

    import numpy as np

    n = _PHASH_TILE
    k = np.arange(n)
    # orthonormal DCT-II basis, fixed-point (x1e4, rounded)
    c = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    c[0, :] = np.sqrt(1.0 / n)
    t = np.round(c * 10_000).astype(np.int64)
    ws = re.compile(rb"[\t\n\f\r ]+")

    for pdf in batches:
        hashes = np.empty(len(pdf), dtype=np.uint64)
        for i, payload in enumerate(pdf["payload"]):
            tile = np.zeros(n * n, dtype=np.int64)
            toks = [w for w in ws.split(bytes(payload)) if w]
            if toks:
                # md5_60 buckets (the repo-wide cross-engine hash);
                # bincount aggregates the whole doc in one pass
                # first 60 bits of md5 == hexdigest()[:15] parsed
                # base-16, but without the hex round trip in the
                # per-token hot loop
                idx = np.fromiter(
                    (
                        (
                            int.from_bytes(
                                hashlib.md5(w).digest()[:8], "big"
                            )
                            >> 4
                        )
                        % (n * n)
                        for w in toks
                    ),
                    dtype=np.int64,
                    count=len(toks),
                )
                tile = np.bincount(idx, minlength=n * n).astype(np.int64)
            tile = tile.reshape(n, n)
            d = t @ tile @ t.T  # integer DCT, exact
            block = d[:8, :8].ravel()
            bits = block > np.median(block)
            hashes[i] = np.packbits(bits.astype(np.uint8)).view(">u8")[0]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "phash": hashes.astype(np.int64),  # two's-complement view
            }
        )


def phash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, phash bigint) via one Arrow-batched pass (no shuffle)."""
    return (
        _payloads(spark, sf_dir)
        .select("doc_id", "payload")
        .mapInPandas(_phash_kernel, "doc_id bigint, phash bigint")
    )


def _phash_oracle() -> str:
    """DuckDB oracle for ``mm_phash_near_dup`` — the whole pipeline is
    fixed-point integers, so it replays verbatim: md5_60 token buckets
    → 1024-cell histogram tile → integer DCT via the SAME rounded
    coefficient rows the kernel computes (shipped as 8×{_PHASH_TILE}
    literals: only u < 8 rows of the basis ever touch the kept 8×8
    block; d[u,v] = Σ_cell t[u, cell//{_PHASH_TILE}] · cnt ·
    t[v, cell%{_PHASH_TILE}]) → median threshold (DuckDB median
    interpolates even counts exactly like np.median) → two's-
    complement bit packing (bit k=0 is the int64 sign bit, matching
    the kernel's uint64→int64 reinterpretation) → 16-bit band
    candidate join → popcount verify. Tokenless documents hash to 0
    via the spine LEFT JOIN, mirroring the kernel's all-zeros tile."""
    import numpy as np

    n = _PHASH_TILE
    k = np.arange(n)
    c = np.sqrt(2.0 / n) * np.cos(
        np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n)
    )
    c[0, :] = np.sqrt(1.0 / n)
    t = np.round(c * 10_000).astype(np.int64)
    tvals = ",\n      ".join(
        ", ".join(f"({u}, {i}, {int(t[u, i])})" for i in range(n))
        for u in range(8)
    )
    from csv_to_parquet_spark.functions import md5_60_sql

    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS w
      FROM documents),
    tk AS (SELECT doc_id, w FROM tok WHERE w <> ''),
    hist AS (
      SELECT doc_id, ({md5_60_sql('w')}) % {n * n} AS cell,
             CAST(count(*) AS BIGINT) AS cnt
      FROM tk GROUP BY 1, 2),
    tmat(u, i, val) AS (VALUES
      {tvals}),
    coef AS (
      SELECT h.doc_id, tu.u AS u, tv.u AS v,
             CAST(SUM(tu.val * h.cnt * tv.val) AS BIGINT) AS d
      FROM hist h
      JOIN tmat tu ON tu.i = h.cell // {n}
      JOIN tmat tv ON tv.i = h.cell % {n}
      GROUP BY 1, 2, 3),
    med AS (SELECT doc_id, median(d) AS m FROM coef GROUP BY 1),
    ph AS (
      SELECT c.doc_id,
             CAST(SUM(CASE WHEN c.d > med.m THEN
                    CASE WHEN c.u = 0 AND c.v = 0
                         THEN -9223372036854775807 - 1
                         ELSE (CAST(1 AS BIGINT) << (63 - (c.u * 8 + c.v)))
                    END ELSE 0 END) AS BIGINT) AS phash
      FROM coef c JOIN med ON med.doc_id = c.doc_id
      GROUP BY 1),
    phall AS (
      SELECT d0.doc_id, COALESCE(ph.phash, 0) AS phash
      FROM (SELECT doc_id FROM documents) d0
      LEFT JOIN ph ON ph.doc_id = d0.doc_id),
    bands AS (
      SELECT doc_id, b.band, (phash >> (16 * b.band)) & 65535 AS key
      FROM phall, (SELECT unnest(range({_PHASH_BANDS})) AS band) b),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, bb.doc_id AS doc_b
      FROM bands a
      JOIN bands bb ON a.band = bb.band AND a.key = bb.key
                   AND a.doc_id < bb.doc_id)
    SELECT c.doc_a, c.doc_b,
           CAST(bit_count(xor(pa.phash, pb.phash)) AS BIGINT) AS hamming
    FROM cand c
    JOIN phall pa ON pa.doc_id = c.doc_a
    JOIN phall pb ON pb.doc_id = c.doc_b
    WHERE bit_count(xor(pa.phash, pb.phash)) <= {_PHASH_MAX_HAMMING}
    """


@CAT.query(
    "mm_phash_near_dup",
    oracle=_phash_oracle(),
)
def mm_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate payload pairs: Hamming distance
    ≤ {_PHASH_MAX_HAMMING} between 64-bit pHashes — the multimodal
    analogue of MinHash dedup (byte-identical dedup is
    ``mm_payload_dedup``; this catches RE-ENCODED/perturbed payloads
    whose decoded content matches).

    Scale shape: hashing is one mapInPandas pass (binary never
    shuffles); candidates come from a 4×16-bit band-bucket self-join —
    lossless at this radius (see _PHASH_MAX_HAMMING) and Θ(collisions),
    never the O(n²) cross join; the exact popcount verify
    (``bit_count(a ^ b)``) runs JVM-side on candidate ids only.
    """
    sig = phash_signatures(spark, sf_dir)
    from csv_to_parquet_spark.operators.cache import persist_tracked

    sig = persist_tracked(sig)  # feeds bands twice + the verify join
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"(phash >> {16 * b}) & 65535"
                        ).alias("key"),
                    )
                    for b in range(_PHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    ha = sig.select(F.col("doc_id").alias("doc_a"), F.col("phash").alias("pa"))
    hb = sig.select(F.col("doc_id").alias("doc_b"), F.col("phash").alias("pb"))
    return (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .withColumn("hamming", F.expr("bit_count(pa ^ pb)").cast("bigint"))
        .filter(F.col("hamming") <= _PHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
    )
