"""Python-side similarity kernels for use inside grouped-map pandas blocks
(greedy merge / Hungarian / SimSort fixpoints). Semantics are identical to
the native-Column versions in ``functions.similarity`` (set cosine over
padded character trigrams of the simplified string, 6dp round — mirrors
Utils.java:477-490 / 869-873) so a value computed JVM-side and one computed
locally agree bit-for-bit."""

from __future__ import annotations

import re

_PUNCT_RE = re.compile(r"[!-/:-@\[-`{-~]")  # Java \p{Punct} = ASCII punct
_WS_RE = re.compile(r"\s+")
_INSANE = {"no_label_found", "no_value", "--"}


def simplify_local(s: str | None) -> str | None:
    if s is None:
        return None
    out = _PUNCT_RE.sub(" ", s.lower())
    out = _WS_RE.sub(" ", out)
    return out.strip()


def trigram_set_local(s: str) -> frozenset[str]:
    padded = "##" + s.lower() + "##"
    return frozenset(padded[i : i + 3] for i in range(len(padded) - 2))


def round_half_up(x: float, scale: int) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-scale), ROUND_HALF_UP))


def cosine_trigram_local(a: str | None, b: str | None) -> float | None:
    """Set cosine |A∩B|/sqrt(|A||B|) over padded trigrams of simplified
    strings; None when either side is insane (Utils.java:483-485)."""
    if a is None or b is None or a in _INSANE or b in _INSANE:
        return None
    sa = trigram_set_local(simplify_local(a))
    sb = trigram_set_local(simplify_local(b))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    inter = len(sa & sb)
    import math

    return round(inter / math.sqrt(len(sa) * len(sb)), 6)


def cosine_vec_local(a, b) -> float | None:
    """Cosine over two numeric vectors (fingerprints); None if either
    missing/zero."""
    import math

    if a is None or b is None:
        return None
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    if na == 0 or nb == 0:
        return None
    return round(dot / (na * nb), 6)


def mean_agg_local(*sims: float | None, scale: int = 10) -> float | None:
    """Mean over non-null channels (MeanAggregationFunction.java:26-49)."""
    present = [s for s in sims if s is not None]
    if not present:
        return None
    return round(sum(present) / len(present), scale)
