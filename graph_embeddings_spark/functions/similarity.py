"""String/numeric/date similarity functions X1-X10 (SURVEY.md §2.7).

Each metric exists in two forms:
  * a pure-Python scalar (`*_py`) — the exact reference semantics, unit-tested
    against hand-computed values, used inside Arrow-batched pandas UDFs for
    exact re-scoring of LSH candidates (graph/canonicalize.py);
  * where expressible, a Spark Column builder (JVM-side, codegen'd) used when
    the metric sits in a hot relational path.

Reference semantics preserved (with citations):
  * tokenizer: split on ' ', trim, drop len<=1 tokens and the 22-stopword
    list, case-SENSITIVE (TokenBased.java:13-18,43-48);
  * token jaccard on distinct-token sets (TokenJaccard.java:24-35);
  * token cosine on token-count multisets (TokenCosine.java);
  * ngram profiles: whitespace runs collapsed to one space, char k-shingles
    (debatty ShingleBased contract; PreComputedNgramJaccard.java:13-53);
  * numeric proximity (|(|a-b|-distance)|+1)^(alpha-1) on ints with the
    '^^datatype' suffix stripped — reproducing the FIX of the reference's
    s2hat-from-s1 bug (Numeric.java:30), per SURVEY.md §7;
  * date sims over ChronoUnit DAYS/MONTHS/YEARS with the BACKWARDS/FORWARDS
    zero gate (Date.java:43-64); pattern 'iso' = BASIC_ISO_DATE (yyyyMMdd);
  * JaroWinkler / NormalizedLevenshtein per the debatty library the reference
    links (Configuration.java:213-215).
"""

from __future__ import annotations

import re
from datetime import date as _date, datetime as _dt

from pyspark.sql import Column, functions as F

STOPWORDS = [
    "the", "of", "and", "a", "an", "to", "in", "is", "you", "that", "it",
    "for", "on", "from", "are", "as", "with", "at", "or", "by", "but", "if",
]  # TokenBased.java:13-18

_WS = re.compile(r"\s+")


# ---------------------------------------------------------------------------
# Tokenizer / profiles (Python scalar forms)
# ---------------------------------------------------------------------------

# Java String.trim() strips every char <= U+0020 — NOT the same set as
# Python str.strip() (unicode whitespace, e.g. \xa0) or Spark F.trim
# (spaces only). All tokenizer forms use this set so the scalar, column,
# and reference (TokenBased.java:57) paths agree on text with tabs/newlines.
_JAVA_TRIM = "".join(chr(i) for i in range(0x21))


def tokenize_py(s: str) -> list[str]:
    out = []
    for raw in s.split(" "):
        tok = raw.strip(_JAVA_TRIM)
        if len(tok) <= 1 or tok in STOPWORDS:
            continue
        out.append(tok)
    return out


def token_profile_py(s: str) -> dict[str, int]:
    prof: dict[str, int] = {}
    for t in tokenize_py(s):
        prof[t] = prof.get(t, 0) + 1
    return prof


def ngram_profile_py(s: str, k: int = 3) -> dict[str, int]:
    s = _WS.sub(" ", s)
    prof: dict[str, int] = {}
    for i in range(len(s) - k + 1):
        sh = s[i : i + k]
        prof[sh] = prof.get(sh, 0) + 1
    return prof


# ---------------------------------------------------------------------------
# X3/X5 token jaccard, X4/X6 token cosine, X7/X8 ngram variants
# ---------------------------------------------------------------------------

def token_jaccard_py(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    k1, k2 = set(token_profile_py(s1)), set(token_profile_py(s2))
    union = k1 | k2
    if not union:
        return 0.0
    return len(k1 & k2) / len(union)


def _cosine(p1: dict[str, int], p2: dict[str, int]) -> float:
    dot = sum(v * p2.get(k, 0) for k, v in p1.items())
    n1 = sum(v * v for v in p1.values()) ** 0.5
    n2 = sum(v * v for v in p2.values()) ** 0.5
    if n1 == 0 or n2 == 0:
        return 0.0
    return dot / (n1 * n2)


def token_cosine_py(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    return _cosine(token_profile_py(s1), token_profile_py(s2))


def ngram_jaccard_py(s1: str, s2: str, k: int = 3) -> float:
    if s1 == s2:
        return 1.0
    k1, k2 = set(ngram_profile_py(s1, k)), set(ngram_profile_py(s2, k))
    union = k1 | k2
    if not union:
        return 0.0
    return len(k1 & k2) / len(union)


def ngram_cosine_py(s1: str, s2: str, k: int = 3) -> float:
    if s1 == s2:
        return 1.0
    return _cosine(ngram_profile_py(s1, k), ngram_profile_py(s2, k))


# ---------------------------------------------------------------------------
# X2 NormalizedLevenshtein / X1 JaroWinkler
# ---------------------------------------------------------------------------

def levenshtein_py(s1: str, s2: str) -> int:
    if s1 == s2:
        return 0
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1):
        cur = [i + 1]
        for j, c2 in enumerate(s2):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (c1 != c2)))
        prev = cur
    return prev[-1]


def normalized_levenshtein_py(s1: str, s2: str) -> float:
    m = max(len(s1), len(s2))
    if m == 0:
        return 1.0
    return 1.0 - levenshtein_py(s1, s2) / m


def jaro_py(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    match_dist = max(len(s1), len(s2)) // 2 - 1
    m1 = [False] * len(s1)
    m2 = [False] * len(s2)
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - match_dist), min(len(s2), i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len(s1)):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / len(s1) + matches / len(s2) + (matches - t) / matches) / 3


def jaro_winkler_py(s1: str, s2: str, threshold: float = 0.7, scaling: float = 0.1) -> float:
    j = jaro_py(s1, s2)
    if j <= threshold:
        return j
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return j + prefix * scaling * (1 - j)


# ---------------------------------------------------------------------------
# X9 numeric / X10 date
# ---------------------------------------------------------------------------

def _strip_datatype(s: str) -> str:
    hat = s.find("^")
    return s[:hat] if hat != -1 else s


def numeric_similarity_py(s1: str, s2: str, smooth: float = 0.5, distance: float = 0.0) -> float:
    """Numeric.java:17-45, with the s2hat bug (s2's suffix located in s1) fixed."""
    if not s1 or not s2:
        return 0.0
    if s1 == s2:
        return 1.0
    s1, s2 = _strip_datatype(s1), _strip_datatype(s2)
    try:
        a, b = int(s1), int(s2)
    except ValueError:
        return 0.0
    return (abs(abs(a - b) - distance) + 1) ** (smooth - 1)


def _parse_date(s: str, pattern: str) -> _date:
    if pattern == "iso":
        return _dt.strptime(s, "%Y%m%d").date()  # BASIC_ISO_DATE (Date.java:24)
    java2py = pattern.replace("yyyy", "%Y").replace("MM", "%m").replace("dd", "%d")
    return _dt.strptime(s, java2py).date()


def _months_between(d1: _date, d2: _date) -> int:
    """ChronoUnit.MONTHS.between — whole months, truncated toward zero."""
    sign = 1
    if d2 < d1:
        d1, d2, sign = d2, d1, -1
    months = (d2.year - d1.year) * 12 + (d2.month - d1.month)
    if d2.day < d1.day:
        months -= 1
    return sign * months


def date_similarity_py(
    s1: str,
    s2: str,
    unit: str = "days",
    smooth: float = 0.5,
    distance: float = 0.0,
    pattern: str = "iso",
    time_direction: str = "bidirectional",
) -> float:
    """Date.java:31-66; unit in {days, months, years}."""
    if not s1 or not s2:
        return 0.0
    if s1 == s2:
        return 1.0
    s1, s2 = _strip_datatype(s1), _strip_datatype(s2)
    try:
        d1, d2 = _parse_date(s1, pattern), _parse_date(s2, pattern)
    except ValueError:
        return 0.0
    td = time_direction.lower()
    if td == "backwards" and d1 > d2:
        return 0.0
    if td == "forwards" and d1 < d2:
        return 0.0
    if unit == "days":
        delta = (d2 - d1).days
    elif unit == "months":
        delta = _months_between(d1, d2)
    elif unit == "years":
        delta = _months_between(d1, d2) // 12 if _months_between(d1, d2) >= 0 else -((-_months_between(d1, d2)) // 12)
    else:
        raise ValueError(f"unknown unit {unit}")
    return (abs(abs(float(delta)) - distance) + 1) ** (smooth - 1)


SCALAR_METRICS = {
    "jarowinkler": jaro_winkler_py,
    "levenshtein": normalized_levenshtein_py,
    "token_jaccard": token_jaccard_py,
    "token_cosine": token_cosine_py,
    "ngram_jaccard": ngram_jaccard_py,
    "ngram_cosine": ngram_cosine_py,
    "numeric": numeric_similarity_py,
    "date_days": lambda s1, s2, **kw: date_similarity_py(s1, s2, unit="days", **kw),
    "date_months": lambda s1, s2, **kw: date_similarity_py(s1, s2, unit="months", **kw),
    "date_years": lambda s1, s2, **kw: date_similarity_py(s1, s2, unit="years", **kw),
}


def make_metric(method: str, **params):
    """Bind group params (ngram k, smooth, distance, pattern, time) to a
    two-arg scalar, for use inside the canonicalization pandas UDF."""
    method = method.lower()
    if method in ("ngram_jaccard", "ngram_cosine"):
        k = int(params.get("ngram", 3))
        base = ngram_jaccard_py if method == "ngram_jaccard" else ngram_cosine_py
        return lambda a, b: base(a, b, k)
    if method == "numeric":
        sm, d = float(params.get("smooth", 0.5)), float(params.get("distance", 0.0))
        return lambda a, b: numeric_similarity_py(a, b, sm, d)
    if method.startswith("date_"):
        unit = method.split("_", 1)[1]
        sm, d = float(params.get("smooth", 0.5)), float(params.get("distance", 0.0))
        pat, td = params.get("pattern", "iso"), params.get("time", "bidirectional")
        return lambda a, b: date_similarity_py(a, b, unit, sm, d, pat, td)
    fn = SCALAR_METRICS[method]
    return lambda a, b: fn(a, b)


# ---------------------------------------------------------------------------
# Spark Column builders (JVM-side forms for hot relational paths)
# ---------------------------------------------------------------------------

def legal_tokens_col(c: Column) -> Column:
    """Tokenizer as a pure column expression (split/trim/filter). btrim
    with the explicit Java-trim char set — F.trim alone strips spaces
    only, diverging from tokenize_py/the reference on tabs/newlines."""
    toks = F.transform(F.split(c, " "), lambda t: F.btrim(t, F.lit(_JAVA_TRIM)))
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.filter(toks, lambda t: (F.length(t) > 1) & ~F.array_contains(stop, t))


def token_jaccard_col(a: Column, b: Column) -> Column:
    """X3 as JVM column math (distinct token sets)."""
    ta, tb = F.array_distinct(legal_tokens_col(a)), F.array_distinct(legal_tokens_col(b))
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(F.array_union(ta, tb))
    return (
        F.when(a == b, F.lit(1.0))
        .when(union == 0, F.lit(0.0))
        .otherwise(inter.cast("double") / union)
    )


def ngram_jaccard_col(a: Column, b: Column, k: int = 3) -> Column:
    """X7 as JVM column math: distinct char k-shingle sets over the
    whitespace-collapsed string (same profile as ngram_jaccard_py /
    debatty ShingleBased — no lowercase, no trim)."""
    from .lsh import char_shingles_col

    sa, sb = char_shingles_col(a, k), char_shingles_col(b, k)
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(F.array_union(sa, sb))
    return (
        F.when(a == b, F.lit(1.0))
        .when(union == 0, F.lit(0.0))
        .otherwise(inter.cast("double") / union)
    )


def _count_in(arr: Column, u: Column) -> Column:
    """Multiplicity of element u in array arr (count profile lookup)."""
    return F.size(F.filter(arr, lambda x: x == u))


def _profile_cosine_col(fa: Column, fb: Column) -> Column:
    """Cosine over the COUNT PROFILES of two element arrays (full arrays,
    duplicates = counts — TokenCosine.java/_cosine semantics). All sums are
    integer-valued (counts and count products), so the double arithmetic is
    exact and engine-order-independent — the DuckDB oracle matches without
    tolerance."""
    da, db = F.array_distinct(fa), F.array_distinct(fb)
    dot = F.aggregate(
        F.array_intersect(da, db),
        F.lit(0.0),
        lambda acc, u: acc + _count_in(fa, u).cast("double") * _count_in(fb, u),
    )

    def sq_norm(full, dist):
        return F.aggregate(
            dist, F.lit(0.0),
            lambda acc, u: acc + F.pow(_count_in(full, u).cast("double"), 2),
        )

    na, nb = sq_norm(fa, da), sq_norm(fb, db)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(
        dot / (F.sqrt(na) * F.sqrt(nb))
    )


def token_cosine_col(a: Column, b: Column) -> Column:
    """X4/X6 token cosine as JVM column math over token-count profiles
    (TokenCosine.java:10-45). Interpreted HOFs — fine in bounded driver/
    rescore paths; corpus-scale rescoring uses token_cosine_py inside the
    Arrow-batched canonicalization UDF."""
    ta, tb = legal_tokens_col(a), legal_tokens_col(b)
    return F.when(a == b, F.lit(1.0)).otherwise(_profile_cosine_col(ta, tb))


def _char_grams_full_col(c: Column, k: int) -> Column:
    """ALL char k-grams (with duplicates — counts matter for cosine) of the
    whitespace-collapsed string (debatty ShingleBased profile)."""
    s = F.regexp_replace(c, r"\s+", " ")
    n = F.length(s) - (k - 1)
    idx = F.sequence(F.lit(1), F.greatest(n, F.lit(0)))
    return F.when(n >= 1, F.transform(idx, lambda i: F.substr(s, i, F.lit(k)))).otherwise(
        F.array().cast("array<string>")
    )


def ngram_cosine_col(a: Column, b: Column, k: int = 3) -> Column:
    """X8 char-k-gram cosine over gram-count profiles
    (PreComputedNgramCosine.java:10-63)."""
    return F.when(a == b, F.lit(1.0)).otherwise(
        _profile_cosine_col(_char_grams_full_col(a, k), _char_grams_full_col(b, k))
    )


def normalized_levenshtein_col(a: Column, b: Column) -> Column:
    """X2 via the builtin levenshtein."""
    m = F.greatest(F.length(a), F.length(b))
    return F.when(m == 0, F.lit(1.0)).otherwise(1.0 - F.levenshtein(a, b) / m)


def _chrono_months_between_col(da: Column, db: Column) -> Column:
    """ChronoUnit.MONTHS.between(da, db) as column math: whole months,
    truncated toward zero (mirrors _months_between above)."""
    raw = (F.year(db) - F.year(da)) * 12 + (F.month(db) - F.month(da))
    fwd = raw - F.when(F.dayofmonth(db) < F.dayofmonth(da), 1).otherwise(0)
    rev = raw + F.when(F.dayofmonth(da) < F.dayofmonth(db), 1).otherwise(0)
    return F.when(db >= da, fwd).otherwise(rev)


def date_similarity_col(
    da: Column,
    db: Column,
    unit: str = "days",
    smooth: float = 0.5,
    distance: float = 0.0,
    time_direction: str = "bidirectional",
) -> Column:
    """X10 over pre-parsed DATE columns — the engine's relational date path
    (Date.java:31-66 semantics; the string form with pattern parsing is
    date_similarity_py, parity-tested against this in test_similarity.py).
    Equality -> 1.0 BEFORE the direction gate, exactly like the scalar."""
    td = time_direction.lower()
    if unit == "days":
        delta = F.datediff(db, da).cast("double")
    elif unit == "months":
        delta = _chrono_months_between_col(da, db).cast("double")
    elif unit == "years":
        m = _chrono_months_between_col(da, db)
        delta = (
            F.when(m >= 0, F.floor(m / 12)).otherwise(-F.floor(-m / 12)).cast("double")
        )
    else:
        raise ValueError(f"unknown unit {unit}")
    sim = F.pow(F.abs(F.abs(delta) - F.lit(distance)) + 1.0, F.lit(smooth - 1.0))
    out = F.when(da.isNull() | db.isNull(), F.lit(0.0)).when(da == db, F.lit(1.0))
    if td == "backwards":
        out = out.when(da > db, F.lit(0.0))
    elif td == "forwards":
        out = out.when(da < db, F.lit(0.0))
    elif td != "bidirectional":
        raise ValueError(f"unknown time_direction {time_direction}")
    return out.otherwise(sim)


def numeric_similarity_col(a: Column, b: Column, smooth: float, distance: float) -> Column:
    """X9 as pure column arithmetic (int-parse failures -> 0)."""
    a2 = F.split(a, r"\^").getItem(0).cast("int")
    b2 = F.split(b, r"\^").getItem(0).cast("int")
    sim = F.pow(F.abs(F.abs(a2 - b2) - F.lit(distance)) + 1, F.lit(smooth - 1.0))
    return (
        F.when((a == "") | (b == ""), F.lit(0.0))
        .when(a == b, F.lit(1.0))
        .when(a2.isNull() | b2.isNull(), F.lit(0.0))
        .otherwise(sim)
    )
