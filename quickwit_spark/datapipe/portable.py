"""Engine-portable hashing for the dedup/ANN verification path.

The production dedup operators hash with `xxhash64` (JVM-native, fast,
but not reproducible in an independent SQL engine). Every operator in
`dedup.py`/`similarity.py` therefore accepts a PORTABLE hash mode whose
arithmetic is plain 64-bit integer math expressible identically in
Spark built-ins AND ANSI SQL — so the DuckDB oracle can re-run the
ENTIRE pipeline (hashes, minhash permutations, LSH banding, hyperplane
signs) and the gate compares final rows exactly, not just row counts.
Same trick as `textstats.fingerprint_portable`.

Portable string hash (base-127 positional, weights cycling every 8
chars; codepoints folded mod 128 so the per-char factor is bounded —
Σ ≤ len/8 · 127·Σ127^k ≈ len·9e15, no int64 overflow for strings up to
~1000 chars on ANY unicode input, and Spark's wrapping long arithmetic
can never diverge from DuckDB's HUGEINT promotion):

    PH(s) = Σ_{i=1..len} (codepoint(s[i]) mod 128) * 127^((i-1) mod 8)

MinHash permutations over P = 2^31 − 1 (A_i·PH' ≤ 1e9·2.1e9 ≈ 2e18,
still in-range):

    sig_i(s) = (A_i * (PH(s) mod P) + B_i) mod P

SimHash bits: two independent 31-bit mixes of PH give a 62-bit
fingerprint. Hyperplane components: parity of an LCG mix of (plane,
dim) → ±1.
"""

from __future__ import annotations

from pyspark.sql import functions as F

P31 = 2_147_483_647  # 2^31 − 1 (prime)
WEIGHTS = [127**k for k in range(8)]


def perm_constants(n: int) -> list[tuple[int, int]]:
    """Deterministic (A_i, B_i) multiplier/offset pairs, A_i ≤ 1e9."""
    out = []
    for i in range(n):
        a = (i * 2_654_435_761 + 1_013_904_223) % 999_999_937 + 1
        b = (i * 97_531 + 12_345) % P31
        out.append((a, b))
    return out


# ---------------------------------------------------------------- Spark side


def portable_hash(col) -> "F.Column":
    """PH(s) as a Spark column expression (JVM built-ins only).
    `col` must be a non-empty string column."""
    warr = F.array(*[F.lit(w).cast("long") for w in WEIGHTS])
    return F.aggregate(
        F.sequence(F.lit(1), F.greatest(F.length(col), F.lit(1))),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + (F.ascii(col.substr(i, F.lit(1))).cast("long") % 128)
        * F.element_at(warr, ((i - F.lit(1)) % 8) + 1),
    )


def plane_component(plane: int, j) -> "F.Column":
    """Hyperplane component h_plane[j] ∈ {−1, +1}: parity of an LCG mix
    (bit 16, so low-bit LCG patterns don't leak). `j` is a column."""
    mixed = (F.lit(plane * 8191).cast("long") + j.cast("long")) * F.lit(
        1_103_515_245
    ).cast("long") + F.lit(12_345).cast("long")
    return ((F.floor(mixed / 65_536) % 2) * 2 - 1).cast("double")


# ----------------------------------------------------------------- SQL side
# generators emit DuckDB/ANSI SQL mirroring the Spark expressions above


def sql_portable_hash(expr: str) -> str:
    """SQL for PH(`expr`) (expr = a string-valued SQL expression)."""
    w = ", ".join(str(x) for x in WEIGHTS)
    return (
        f"list_sum(list_transform(range(1, length({expr}) + 1), "
        f"i -> (ascii(({expr})[i]) % 128) * ([{w}])[((i - 1) % 8) + 1]))"
    )


def sql_plane_component(plane: int, j_expr: str) -> str:
    """SQL for plane_component(plane, j)."""
    return (
        f"CAST(((({plane * 8191} + {j_expr}) * 1103515245 + 12345) // 65536)"
        f" % 2 * 2 - 1 AS DOUBLE)"
    )
