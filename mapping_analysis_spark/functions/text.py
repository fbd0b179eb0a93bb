"""Text normalization & blocking-key Column expressions.

Semantics re-created from the reference's ``util/Utils.java`` (studied for
behavior; re-expressed as native Spark Column expressions so they run inside
whole-stage codegen — the reference runs these row-at-a-time in Java):

* ``simplify``                  — Utils.java:832-837
* ``geo_simplify``              — Utils.java:839-851
* ``music_blocking_label``      — Utils.java:682-732
* ``geo_blocking_label``        — Utils.java:805-825
* ``nc_blocking_label``         — Utils.java:208-233
* ``artist_title_album``        — Utils.java:760-788 (createSimpleArtistTitleAlbum)
* ``is_sane``                   — Utils.java:89-94
* ``stable_hash64``             — Utils.java:55,894-896 (md5→long; we use
  xxhash64 — any deterministic 64-bit hash applied consistently preserves
  the reference's semantics, which only needs stable distinct ids)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java \p{Punct}: ASCII punctuation. Spark regexes are Java regexes, so the
# class matches the reference exactly.
_PUNCT = r"[\p{Punct}]"

_INSANE = ("no_label_found", "no_value", "--")


def is_sane(col: Column) -> Column:
    """Null/anomaly check (Utils.isSane, Utils.java:89-94)."""
    return col.isNotNull() & ~col.isin(*_INSANE)


def simplify(col: Column) -> Column:
    """Lowercase, punctuation→space, collapse whitespace, trim
    (Utils.simplify, Utils.java:832-837)."""
    out = F.regexp_replace(F.lower(col), _PUNCT, " ")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def geo_simplify(col: Column) -> Column:
    """First punctuation-free segment, lowercased/trimmed
    (Utils.geoSimplify, Utils.java:839-851). The reference splits on
    punctuation, trims, drops empties, takes the first piece."""
    # Split on punctuation, filter empties after trim, take element 0.
    parts = F.split(col, _PUNCT)
    trimmed = F.transform(parts, lambda p: F.trim(p))
    nonempty = F.filter(trimmed, lambda p: p != "")
    first = F.coalesce(F.element_at(nonempty, 1), F.lit(""))
    return F.trim(F.regexp_replace(F.lower(first), r"\s+", " "))


def music_blocking_label(col: Column, blocking_length: int = 4) -> Column:
    """Music blocking key (Utils.getMusicBlockingLabel, Utils.java:682-732).

    lowercase; if the string starts with "the" and is longer than 3 chars,
    drop the first 4 chars and trim; take the first ``blocking_length``
    chars; if that leaves an empty string fall back to the prefix of the
    original lowercased label.
    """
    low = F.lower(col)
    stripped = F.when(
        low.startswith("the") & (F.length(low) > 3),
        F.trim(F.substring(low, 5, 1 << 30)),
    ).otherwise(low)
    prefixed = F.substring(stripped, 1, blocking_length)
    fallback = F.substring(low, 1, blocking_length)
    return F.when(prefixed == "", fallback).otherwise(prefixed)


def geo_blocking_label(col: Column, blocking_length: int = 3) -> Column:
    """Geo blocking key (Utils.getGeoBlockingLabel, Utils.java:805-825):
    pad with '#' to length, take prefix, lowercase, collapse non-[a-z0-9#]
    runs to a single '#', re-pad (runs collapsing can shorten)."""
    padded = F.rpad(col, blocking_length, "#")
    pref = F.lower(F.substring(padded, 1, blocking_length))
    cleaned = F.regexp_replace(pref, "[^a-zA-Z0-9#]+", "#")
    return F.rpad(cleaned, blocking_length, "#")


def nc_blocking_label(name: Column, surname: Column, blocking_length: int = 4) -> Column:
    """NC blocking key (Utils.getNcBlockingLabel, Utils.java:208-233):
    first k chars of name + first k of surname where k = blocking_length/2,
    space-padding short values."""
    k = {2: 1, 4: 2, 6: 3, 8: 4}.get(blocking_length, 2)
    return F.concat(
        F.substring(F.rpad(name, k, " "), 1, k),
        F.substring(F.rpad(surname, k, " "), 1, k),
    )


# soundex consonant codes for a..z (b,f,p,v→1; c,g,j,k,q,s,x,z→2; d,t→3;
# l→4; m,n→5; r→6; vowels + h,w,y → 0)
_SOUNDEX_CODES = "01230120022455012623010202"


def phonetic_key(col: Column, digits: int = 3) -> Column:
    """Soundex-style phonetic blocking key (north-star: "LSH/soundex-style
    prefix blocking").

    Algorithm (a deterministic simplified soundex, defined here rather than
    borrowed from any library so the same chain of string primitives can be
    replayed verbatim by an external SQL engine for verification):

    1. lowercase, strip non-letters;
    2. code EVERY letter with the classic soundex consonant classes
       (vowels/h/w/y → 0);
    3. collapse adjacent equal codes (this merges run-on consonants into
       the leading letter's code, as classic soundex does);
    4. key = uppercase first letter + the next ``digits`` non-zero codes
       after the first position, right-padded with '0';
    5. null for inputs with no letters.

    Entirely native Columns (lower/regexp/translate/rpad) — codegen'd,
    no Python. Differs from classic soundex only in the h/w
    "transparent separator" corner rule, which needs lookbehind state
    that neither Spark nor portable SQL regexes express.
    """
    norm = F.regexp_replace(F.lower(col), "[^a-z]", "")
    coded = F.translate(norm, "abcdefghijklmnopqrstuvwxyz", _SOUNDEX_CODES)
    collapsed = coded
    for d in "0123456":
        collapsed = F.regexp_replace(collapsed, d + d + "+", d)
    tail = F.translate(F.substring(collapsed, 2, 1 << 30), "0", "")
    key = F.concat(
        F.upper(F.substring(norm, 1, 1)),
        F.rpad(F.substring(tail, 1, digits), digits, "0"),
    )
    return F.when(F.length(norm) > 0, key)


def artist_title_album(artist: Column, label: Column, album: Column) -> Column:
    """Concatenate sane(artist, label, album) with " - " then simplify
    (Utils.createSimpleArtistTitleAlbum, Utils.java:760-788). The " - "
    divider is itself punctuation so simplification reduces it to a space.
    """
    parts = F.array(
        F.when(is_sane(artist), artist),
        F.when(is_sane(label), label),
        F.when(is_sane(album), album),
    )
    joined = F.array_join(F.filter(parts, lambda p: p.isNotNull()), " - ")
    return simplify(joined)


def stable_hash64(col: Column) -> Column:
    """Deterministic 64-bit hash of a string (replaces Utils.getHash
    md5-as-long, Utils.java:55,894-896)."""
    return F.xxhash64(col)


def trigrams(col: Column) -> Column:
    """All lowercase character 3-grams, in order, possibly repeated
    (Utils.getUnsortedTrigrams, Utils.java:878-892) — as array<string>.

    Expressed natively: sequence over the index range + substring, so it
    stays JVM-side (no Python).
    """
    low = F.lower(col)
    n = F.length(low)
    idx = F.when(n >= 3, F.sequence(F.lit(1), n - 2)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.substring(low, i, 3))


def padded_trigrams(col: Column, pad: str = "##") -> Column:
    """q-grams with q-1 '#' padding on both ends, the tokenizer behind the
    reference's cosine-trigram metric (simmetrics qGramWithPadding(3) used
    at Utils.java:869-873)."""
    return trigrams(F.concat(F.lit(pad), F.lower(col), F.lit(pad)))
