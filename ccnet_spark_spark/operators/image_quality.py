"""LAION/DataComp-style image+caption quality gates.

The reference's quality filter is caption-side (ccnet rules:
pipe_len.py, pipe_lid.py, pipe_perplexity.py); web-scale IMAGE corpora
add a metadata-side gate family applied long before any pixel is
decoded (LAION-5B / DataComp filtering: minimum resolution, aspect-ratio
bounds, format allowlist, payload-size sanity, caption length / word /
digit heuristics). This module expresses those gates as pure built-in
Column expressions over the arriving pair metadata — zero decode, zero
Python, zero shuffle: a scan-side predicate bundle that whole-stage
codegen fuses into the parquet scan at 10^12 scale. `bytes` is touched
only by length() (never decoded); with the size gate disabled
(min_bytes <= 0) the payload column is pruned from the scan entirely.

Aspect ratio is compared in INTEGER math (greatest*den <= least*num),
so the verdict is bit-exact across engines — no float division in any
gate that feeds the keep decision.

Each gate has a DuckDB SQL twin (oracle_sql builds the same CASE chain
over a metadata fixture); reasons are first-failure in documented
priority order, mirroring the text pipeline's verdict.reason design
(operators/verdict.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import textstats


@dataclass(frozen=True)
class ImageGateConfig:
    """Thresholds. aspect bound is the rational num/den (default 2/1:
    longer side at most 2x the shorter)."""

    min_w: int = 32
    min_h: int = 32
    aspect_num: int = 2
    aspect_den: int = 1
    min_bytes: int = 1024
    caption_min_chars: int = 5
    caption_max_chars: int = 5000
    caption_min_words: int = 3
    max_digit_ratio: float = 0.3
    fmt_allow: tuple[str, ...] = ("ppm", "qjpg")


# (gate column, reason emitted when it is the FIRST failure) — priority order.
GATE_REASONS = [
    ("dims_ok", "bad_dims"),
    ("aspect_ok", "bad_aspect"),
    ("fmt_ok", "bad_fmt"),
    ("bytes_ok", "too_few_bytes"),
    ("caption_chars_ok", "caption_len"),
    ("caption_words_ok", "too_few_words"),
    ("digit_ok", "digit_heavy"),
]


def _nn(c: Column) -> Column:
    """NULL metadata fails its gate (never NULL-propagates into keep)."""
    return F.coalesce(c, F.lit(False))


def gate_map(cfg: ImageGateConfig = ImageGateConfig(), text_col: str = "caption") -> dict[str, Column]:
    """The gate expressions by name (priority order = GATE_REASONS). Pure
    Columns over (w, h, fmt, bytes, <text_col>) — usable as a labeled
    projection (image_quality_gates) or directly as a scan filter
    (plans/pipeline.py image_gates stage)."""
    cap = F.col(text_col)
    return {
        "dims_ok": _nn((F.col("w") >= cfg.min_w) & (F.col("h") >= cfg.min_h)),
        "aspect_ok": _nn(
            F.greatest("w", "h") * F.lit(cfg.aspect_den)
            <= F.least("w", "h") * F.lit(cfg.aspect_num)
        ),
        "fmt_ok": _nn(F.col("fmt").isin(*cfg.fmt_allow)),
        # min_bytes <= 0 disables the one bytes-touching gate as a literal,
        # so Catalyst prunes the payload column from the scan entirely
        "bytes_ok": _nn(F.length("bytes") >= cfg.min_bytes) if cfg.min_bytes > 0 else F.lit(True),
        "caption_chars_ok": _nn(
            (F.length(cap) >= cfg.caption_min_chars) & (F.length(cap) <= cfg.caption_max_chars)
        ),
        "caption_words_ok": _nn(textstats.token_count_expr(cap) >= cfg.caption_min_words),
        "digit_ok": _nn(textstats.digit_ratio_expr(cap) <= cfg.max_digit_ratio),
    }


def keep_expr(cfg: ImageGateConfig = ImageGateConfig(), text_col: str = "caption") -> Column:
    """Conjunction of all gates — a single scan-side filter predicate."""
    keep = None
    for g in gate_map(cfg, text_col).values():
        keep = g if keep is None else (keep & g)
    return keep


def image_quality_gates(pairs: DataFrame, cfg: ImageGateConfig = ImageGateConfig()) -> DataFrame:
    """pairs(image_id, bytes, w, h, fmt, caption, ...) -> one row per pair
    with per-gate booleans, the fused keep verdict, and a first-failure
    reason. Narrow projection: bytes participates only via length()."""
    gates = gate_map(cfg)
    keep = keep_expr(cfg)
    reason = F.lit("ok")
    for name, why in reversed(GATE_REASONS):
        reason = F.when(~gates[name], F.lit(why)).otherwise(reason)
    return pairs.select(
        "image_id",
        "w",
        "h",
        "fmt",
        *[g.alias(n) for n, g in gates.items()],
        keep.alias("keep"),
        reason.alias("reason"),
    )


def image_quality_gates_sql(meta_table: str, cfg: ImageGateConfig = ImageGateConfig()) -> str:
    """DuckDB twin over a metadata relation with columns
    (image_id, w, h, fmt, n_bytes, caption) — n_bytes stands in for
    length(bytes) so the fixture never stores payloads."""
    fmts = ", ".join(f"'{f}'" for f in cfg.fmt_allow)
    wc = textstats.token_count_sql("caption")
    dr = textstats.digit_ratio_sql("caption")
    gates = {
        "dims_ok": f"coalesce(w >= {cfg.min_w} and h >= {cfg.min_h}, false)",
        "aspect_ok": (
            f"coalesce(greatest(w, h) * {cfg.aspect_den} <= least(w, h) * {cfg.aspect_num}, false)"
        ),
        "fmt_ok": f"coalesce(fmt in ({fmts}), false)",
        "bytes_ok": f"coalesce(n_bytes >= {cfg.min_bytes}, false)",
        "caption_chars_ok": (
            f"coalesce(length(caption) >= {cfg.caption_min_chars} "
            f"and length(caption) <= {cfg.caption_max_chars}, false)"
        ),
        "caption_words_ok": f"coalesce({wc} >= {cfg.caption_min_words}, false)",
        "digit_ok": f"coalesce({dr} <= {cfg.max_digit_ratio}, false)",
    }
    gate_cols = ", ".join(f"{sql} as {n}" for n, sql in gates.items())
    gate_names = ", ".join(gates)
    keep = " and ".join(gates)
    reason = "case " + " ".join(
        f"when not {n} then '{why}'" for n, why in GATE_REASONS
    ) + " else 'ok' end"
    return (
        f"select image_id, w, h, fmt, {gate_names}, ({keep}) as keep, {reason} as reason "
        f"from (select *, {gate_cols} from {meta_table})"
    )


# ------------------------------------------------- boilerplate captions
# LAION's known failure mode: one stock caption ("image", "DSC_0123",
# "thumbnail for the video") attached to thousands of unrelated images.
# The gate counts images per NORMALIZED caption (the dedup normalizer —
# functions/normalize.py — so case/punct/digit variants collapse) and
# flags captions above a repetition budget. ONE shuffle: a window count
# over xxhash64(norm); the caption text itself never shuffles (64-bit
# hashes do), and at 10^12 scale AQE's skew handling splits the
# pathological all-same-caption partitions the gate exists to catch.


def caption_count_col(text_col: str = "caption") -> Column:
    """Images per NORMALIZED caption as a window-count Column — the
    single shuffle both caption_frequency and the pipeline's budget
    stage share."""
    from pyspark.sql import Window

    from ..functions.normalize import normalize_for_dedup_expr

    w = Window.partitionBy(F.xxhash64(normalize_for_dedup_expr(F.col(text_col))))
    return F.count(F.lit(1)).over(w).cast("long")


def caption_frequency(
    pairs: DataFrame, max_count: int = 10, text_col: str = "caption", id_col: str = "image_id"
) -> DataFrame:
    """pairs(<id_col>, <text_col>, ...) -> (<id_col>, caption_count,
    boilerplate). NULL captions normalize to NULL and group together —
    they are already caught by the metadata gates, so they are exempt
    here (boilerplate=false) rather than double-counted."""
    cnt = caption_count_col(text_col)
    return pairs.select(
        id_col,
        cnt.alias("caption_count"),
        (F.col(text_col).isNotNull() & (cnt > max_count)).alias("boilerplate"),
    )


def caption_frequency_sql(meta_table: str, max_count: int = 10) -> str:
    """DuckDB twin — counts over the same normalized caption. The twin
    groups by the normalized STRING rather than its xxhash64 (DuckDB has
    no xxhash64); equal strings <=> equal hashes modulo 64-bit collisions,
    which the contract corpus cannot exhibit."""
    from ..functions.normalize import normalize_for_dedup_sql

    norm = normalize_for_dedup_sql("caption")
    return (
        "select image_id, cast(count(*) over (partition by "
        + norm
        + ") as bigint) as caption_count, "
        "caption is not null and count(*) over (partition by "
        + norm
        + f") > {max_count} as boilerplate from {meta_table}"
    )
