"""xxHash64 (Spark's ``xxhash64``, seed 42) as pure DuckDB SQL.

Spark hashes rows with XXH64 everywhere (``xxhash64`` the function, plus
hash-partitioning internals); DuckDB has no xxhash64, which is why several
hash-keyed operators (LSH band keys, bloom prefilters) were verified through
their OUTPUTS rather than a full value-level oracle.  This module closes
that gap: it GENERATES a single-statement DuckDB SQL program computing
bit-exact XXH64 for BIGINT and VARCHAR columns, including multi-column
seed chaining (Spark folds column i's hash in as column i+1's seed).

Public algorithm (xxHash by Yann Collet, BSD-2; the Java layout mirrored
here is ``org.apache.spark.sql.catalyst.expressions.XXH64``):

* 64-bit lanes, all arithmetic mod 2**64; inputs consumed as little-endian
  words; strings >= 32 bytes run a 4-accumulator stripe loop, then 8/4/1
  -byte tails, then an avalanche (fmix).

DuckDB mechanics — why this is expressible at all:

* every multiply in XXH64 is BY A CONSTANT, so ``a * c mod 2**64``
  decomposes into 32-bit limbs (``al*cl + ((al*ch + ah*cl) mod 2**32) <<
  32``) whose intermediates fit HUGEINT (int128) under DuckDB's checked
  arithmetic — nothing ever overflows, nothing needs wrap-around UBIGINT;
* rotations/shifts become ``// 2**k`` and ``* 2**k % 2**64`` on
  non-negative HUGEINTs; xor is native on HUGEINT;
* the fixed-length pipeline is emitted as CHAINED CTE STEPS (one derived
  column per primitive op) — inlining would duplicate subexpressions
  multiplicatively per step; a step referencing the previous step's COLUMN
  keeps the program linear in the step count;
* the variable-length loops (stripes / 8-byte tail / byte tail) are
  ``list_reduce`` over ``list_transform(range(...))`` with the initial
  accumulator PREPENDED (DuckDB 1.0 list_reduce has no init argument and
  rejects empty lists — prepending makes both problems vanish);
* bytes come from ``hex(encode(s))`` + 2-char ``substr`` + ``('0x'||..)``
  cast: UTF-8 exactly as Spark hashes it.

Used by the ``fn_xxhash64_suite`` differential query and available to
promote any Spark-side xxhash64 derivation to a full DuckDB oracle.
"""

from __future__ import annotations

_M = "18446744073709551616::HUGEINT"  # 2**64
_MASK = (1 << 64) - 1

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SEED = 42


def _add(a: str, b: str) -> str:
    return f"((({a}) + ({b})) % {_M})"


def _addc(a: str, c: int) -> str:
    return _add(a, f"{c % (1 << 64)}::HUGEINT")


def _mulc(a: str, c: int) -> str:
    """``a * c mod 2**64`` via 32-bit limbs; every intermediate < 2**65."""
    cl, ch = c & 0xFFFFFFFF, (c >> 32) & 0xFFFFFFFF
    al = f"(({a}) % 4294967296::HUGEINT)"
    ah = f"(({a}) // 4294967296::HUGEINT)"
    return (
        f"(({al} * {cl}::HUGEINT"
        f" + (({al} * {ch}::HUGEINT + {ah} * {cl}::HUGEINT)"
        f" % 4294967296::HUGEINT) * 4294967296::HUGEINT) % {_M})"
    )


def _rotl(x: str, r: int) -> str:
    # the two parts occupy disjoint bit ranges, so + is |
    return (
        f"(((({x}) * {1 << r}::HUGEINT) % {_M})"
        f" + (({x}) // {1 << (64 - r)}::HUGEINT))"
    )


def _xor(a: str, b: str) -> str:
    return f"xor(({a})::HUGEINT, ({b})::HUGEINT)"


def _shr_xor(x: str, n: int) -> str:
    return f"xor(({x})::HUGEINT, (({x}) // {1 << n}::HUGEINT))"


def _fmix_steps(steps: list[tuple[str, str]], h: str, tag: str) -> str:
    steps.append((f"{tag}_f1", _shr_xor(h, 33)))
    steps.append((f"{tag}_f2", _mulc(f"{tag}_f1", P2)))
    steps.append((f"{tag}_f3", _shr_xor(f"{tag}_f2", 29)))
    steps.append((f"{tag}_f4", _mulc(f"{tag}_f3", P3)))
    steps.append((f"{tag}_f5", _shr_xor(f"{tag}_f4", 32)))
    return f"{tag}_f5"


def _signed(h: str) -> str:
    return (
        f"(CASE WHEN ({h}) >= 9223372036854775808::HUGEINT"
        f" THEN ({h}) - {_M} ELSE ({h}) END)::BIGINT"
    )


def hash_long_steps(
    steps: list[tuple[str, str]], col: str, seed: str, tag: str
) -> str:
    """Append the CTE steps hashing BIGINT column ``col`` with unsigned
    HUGEINT seed expression ``seed``; returns the unsigned result column."""
    steps.append((
        f"{tag}_x",
        f"(CASE WHEN ({col}) < 0 THEN ({col})::HUGEINT + {_M}"
        f" ELSE ({col})::HUGEINT END)",
    ))
    steps.append((f"{tag}_k1", _mulc(f"{tag}_x", P2)))
    steps.append((f"{tag}_k2", _rotl(f"{tag}_k1", 31)))
    steps.append((f"{tag}_k3", _mulc(f"{tag}_k2", P1)))
    steps.append((f"{tag}_h1", _xor(_addc(seed, P5 + 8), f"{tag}_k3")))
    steps.append((f"{tag}_h2", _rotl(f"{tag}_h1", 27)))
    steps.append((f"{tag}_h3", _addc(_mulc(f"{tag}_h2", P1), P4)))
    return _fmix_steps(steps, f"{tag}_h3", tag)


def _byte(hx: str, off: str) -> str:
    """Byte at 0-based offset ``off`` of the hex dump ``hx``, as HUGEINT."""
    return (
        f"('0x' || substr({hx}, (2 * ({off}) + 1)::BIGINT, 2))::BIGINT::HUGEINT"
    )


def _le_word(hx: str, off: str, nbytes: int) -> str:
    """Little-endian ``nbytes``-byte word at byte offset ``off``."""
    terms = " + ".join(
        f"{_byte(hx, f'({off}) + {j}')} * {1 << (8 * j)}::HUGEINT"
        for j in range(nbytes)
    )
    return f"({terms})"


def hash_string_steps(
    steps: list[tuple[str, str]], col: str, seed: str, tag: str
) -> str:
    """Append the CTE steps hashing VARCHAR column ``col`` (UTF-8 bytes)
    with unsigned HUGEINT seed expression ``seed``; returns the unsigned
    result column.  Full XXH64: 32-byte stripe loop + 8/4/1-byte tails."""
    hx, n = f"{tag}_hx", f"{tag}_n"
    steps.append((hx, f"hex(encode({col}))"))
    steps.append((n, f"octet_length(encode({col}))::HUGEINT"))

    # ---- main loop: 4 accumulators over 32-byte stripes -----------------
    stripe_struct = (
        "{"
        f"'v1': {_le_word(hx, '32 * i', 8)}, "
        f"'v2': {_le_word(hx, '32 * i + 8', 8)}, "
        f"'v3': {_le_word(hx, '32 * i + 16', 8)}, "
        f"'v4': {_le_word(hx, '32 * i + 24', 8)}"
        "}"
    )
    init_struct = (
        "{"
        f"'v1': {_add(_addc(seed, P1), f'{P2}::HUGEINT')}, "
        f"'v2': {_addc(seed, P2)}, "
        f"'v3': ({seed}), "
        f"'v4': {_addc(seed, (-P1) % (1 << 64))}"
        "}"
    )

    def _lane(acc: str, x: str) -> str:
        return _mulc(_rotl(_add(acc, _mulc(x, P2)), 31), P1)

    lam = (
        "(acc, x) -> {"
        + ", ".join(
            f"'v{i}': {_lane(f'acc.v{i}', f'x.v{i}')}" for i in (1, 2, 3, 4)
        )
        + "}"
    )
    steps.append((
        f"{tag}_vs",
        f"list_reduce(list_prepend({init_struct}, "
        f"list_transform(range(0, ({n} // 32)::BIGINT), i -> {stripe_struct})), "
        f"{lam})",
    ))
    hm = f"{tag}_hm0"
    steps.append((
        hm,
        "("
        + " + ".join(
            _rotl(f"{tag}_vs.v{i}", r)
            for i, r in ((1, 1), (2, 7), (3, 12), (4, 18))
        )
        + f") % {_M}",
    ))
    for i in (1, 2, 3, 4):
        nxt = f"{tag}_hm{i}"
        merged = _xor(
            hm, _mulc(_rotl(_mulc(f"{tag}_vs.v{i}", P2), 31), P1)
        )
        steps.append((nxt, _addc(_mulc(merged, P1), P4)))
        hm = nxt

    # ---- tail ------------------------------------------------------------
    steps.append((
        f"{tag}_hb",
        f"(CASE WHEN {n} >= 32 THEN {hm} ELSE {_addc(seed, P5)} END + {n})"
        f" % {_M}",
    ))
    t0 = f"(({n} // 32) * 32)"
    steps.append((f"{tag}_c8", f"(({n} - {t0}) // 8)::BIGINT"))
    eight_lam = (
        "(acc, x) -> "
        + _addc(
            _mulc(_rotl(_xor("acc", _mulc(_rotl(_mulc("x", P2), 31), P1)), 27), P1),
            P4,
        )
    )
    steps.append((
        f"{tag}_h8",
        f"list_reduce(list_prepend({tag}_hb, "
        f"list_transform(range(0, {tag}_c8), "
        f"i -> {_le_word(hx, f'{t0} + 8 * i', 8)})), {eight_lam})",
    ))
    t1 = f"({t0} + 8 * {tag}_c8)"
    four = _addc(
        _mulc(
            _rotl(_xor(f"{tag}_h8", _mulc(_le_word(hx, t1, 4), P1)), 23), P2
        ),
        P3,
    )
    steps.append((
        f"{tag}_h4",
        f"CASE WHEN {n} - {t1} >= 4 THEN {four} ELSE {tag}_h8 END",
    ))
    t2 = f"({t1} + CASE WHEN {n} - {t1} >= 4 THEN 4 ELSE 0 END)"
    byte_lam = (
        "(acc, x) -> " + _mulc(_rotl(_xor("acc", _mulc("x", P5)), 11), P1)
    )
    steps.append((
        f"{tag}_h1b",
        f"list_reduce(list_prepend({tag}_h4, "
        f"list_transform(range(0, ({n} - {t2})::BIGINT), "
        f"i -> {_byte(hx, f'{t2} + i')})), {byte_lam})",
    ))
    return _fmix_steps(steps, f"{tag}_h1b", tag)


def steps_to_sql(
    base_sql: str, steps: list[tuple[str, str]], select: str
) -> str:
    """Compose chained single-column CTE steps over ``base_sql`` and finish
    with ``select`` (which sees every step column)."""
    ctes = [f"xx0 AS ({base_sql})"]
    for i, (name, expr) in enumerate(steps, start=1):
        ctes.append(f"xx{i} AS (SELECT *, {expr} AS {name} FROM xx{i - 1})")
    return f"WITH {', '.join(ctes)}\n    {select.replace('__LAST__', f'xx{len(steps)}')}"


def signed_col(unsigned_col: str) -> str:
    """Spark renders the hash as a signed BIGINT; convert at the end."""
    return _signed(unsigned_col)
