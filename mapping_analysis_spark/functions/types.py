"""Semantic-type normalization + type similarity (geo domain).

Re-creates the reference's type channel:

* ``TypeDictionary.PRIMARY_TYPE`` (util/TypeDictionary.java:14-250) maps
  per-source raw type strings (dbpedia/freebase/linkedgeodata/schema.org
  URIs, GeoNames feature codes) onto a small set of canonical classes.
  The dictionary here carries a representative subset covering every
  canonical class the reference targets — it is plain data, extensible by
  passing ``extra`` to ``normalize_types``.
* ``TypeDictionary.TYPE_SHADINGS`` (util/TypeDictionary.java:266-273):
  directed "shading" pairs of canonical classes that still count as a type
  match (``Constants.SHADING_TYPE_SIM`` = 1.0, util/Constants.java:101).
* ``Utils.getTypeSim`` (util/Utils.java:636-667): 1 if the two type sets
  intersect, SHADING_TYPE_SIM if any (src, trg) pair is shaded in either
  direction, else 0. The reference scans set elements in order and returns
  the first non-zero hit; since SHADING_TYPE_SIM == 1.0 the scan order
  cannot change the value, so the set formulation below is exactly
  equivalent.
* ``Utils.hasEmptyType`` (util/Utils.java:669-673): a side containing
  ``no_type`` casts NO vote — the sim channel is null, mirroring
  GeoSimilarityFunction.addTypeSimilarity (simcomputation/
  GeoSimilarityFunction.java:78-90) which only adds SIM_TYPE when neither
  side is untyped.

Everything is native Columns: the dictionaries compile into the plan as
literal maps (broadcast-free), the similarity is array intersections inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NO_TYPE = "no_type"  # Constants.java:178
SHADING_TYPE_SIM = 1.0  # Constants.java:101

# TypeDictionary.TYPE_SHADINGS (TypeDictionary.java:266-273), directed
TYPE_SHADINGS: dict[str, str] = {
    "ArchitecturalStructure": "School",
    "Mountain": "Island",
    "Country": "Settlement",
    "Settlement": "AdministrativeRegion",
    "AdministrativeRegion": "Country",
}

# TypeDictionary.SHADED_TYPES (TypeDictionary.java:255-263)
SHADED_TYPES = frozenset(
    {"ArchitecturalStructure", "Mountain", "AdministrativeRegion", "BodyOfWater", "Park"}
)

# Representative subset of TypeDictionary.PRIMARY_TYPE (TypeDictionary
# .java:14-250): raw per-source type string → canonical class.
PRIMARY_TYPE: dict[str, str] = {
    # Settlement
    "http://dbpedia.org/ontology/Settlement": "Settlement",
    "http://dbpedia.org/ontology/Town": "Settlement",
    "http://dbpedia.org/ontology/City": "Settlement",
    "http://dbpedia.org/ontology/Village": "Settlement",
    "http://rdf.freebase.com/ns/location.citytown": "Settlement",
    "http://linkedgeodata.org/ontology/City": "Settlement",
    "http://linkedgeodata.org/ontology/Town": "Settlement",
    "http://linkedgeodata.org/ontology/Village": "Settlement",
    "http://schema.org/City": "Settlement",
    "city, village,...": "Settlement",
    # BodyOfWater
    "http://dbpedia.org/ontology/BodyOfWater": "BodyOfWater",
    "http://dbpedia.org/ontology/River": "BodyOfWater",
    "http://dbpedia.org/ontology/Lake": "BodyOfWater",
    "http://rdf.freebase.com/ns/geography.river": "BodyOfWater",
    "http://rdf.freebase.com/ns/geography.lake": "BodyOfWater",
    "stream": "BodyOfWater",
    "lake": "BodyOfWater",
    "bay": "BodyOfWater",
    "canal": "BodyOfWater",
    # Mountain
    "http://dbpedia.org/ontology/Mountain": "Mountain",
    "http://dbpedia.org/ontology/MountainRange": "Mountain",
    "http://linkedgeodata.org/ontology/Peak": "Mountain",
    "mountain": "Mountain",
    "hill": "Mountain",
    # AdministrativeRegion / Country
    "http://dbpedia.org/ontology/AdministrativeRegion": "AdministrativeRegion",
    "http://rdf.freebase.com/ns/location.administrative_division": "AdministrativeRegion",
    "http://dbpedia.org/ontology/Country": "Country",
    "http://rdf.freebase.com/ns/location.country": "Country",
    # Island / School / Park / ArchitecturalStructure
    "http://dbpedia.org/ontology/Island": "Island",
    "island": "Island",
    "http://dbpedia.org/ontology/School": "School",
    "http://dbpedia.org/ontology/University": "School",
    "http://dbpedia.org/ontology/Park": "Park",
    "park": "Park",
    "http://dbpedia.org/ontology/ArchitecturalStructure": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/Building": "ArchitecturalStructure",
    "building(s)": "ArchitecturalStructure",
}


def _literal_map(d: dict[str, str]) -> Column:
    pairs: list[Column] = []
    for k, v in d.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.create_map(*pairs)


def normalize_types(
    types: Column, extra: dict[str, str] | None = None
) -> Column:
    """Map raw type strings through PRIMARY_TYPE (unknown strings pass
    through unchanged — Utils.getShadingType keeps non-dictionary values),
    distinct. ``extra`` augments/overrides the dictionary."""
    mapping = dict(PRIMARY_TYPE)
    if extra:
        mapping.update(extra)
    m = _literal_map(mapping)
    return F.array_distinct(
        F.transform(types, lambda t: F.coalesce(F.element_at(m, t), t))
    )


# Utils.getShadingType (Utils.java:588-608): generalization applied before
# bit-packing comp types for the merge restriction — maps a type onto its
# "most common ancestor" among the 5 comp classes
SHADING_GENERALIZATION: dict[str, str] = {
    "School": "ArchitecturalStructure",
    "Island": "Mountain",
    "Settlement": "AdministrativeRegion",
    "Country": "AdministrativeRegion",
}


def shading_generalize(types: Column) -> Column:
    """Utils.getShadingTypes (Utils.java:610-627): replace each type by its
    generalized ancestor, distinct. Used for the merge-phase comp-type
    overlap restriction (AbstractionUtils.getTypesInt bit-packs only the
    generalized classes, AbstractionUtils.java:22-31)."""
    m = _literal_map(SHADING_GENERALIZATION)
    return F.array_distinct(
        F.transform(types, lambda t: F.coalesce(F.element_at(m, t), t))
    )


def _shaded(types: Column) -> Column:
    """The shading images of a type array (non-null lookups only)."""
    m = _literal_map(TYPE_SHADINGS)
    return F.filter(
        F.transform(types, lambda t: F.element_at(m, t)), lambda s: s.isNotNull()
    )


def type_sim(src_types: Column, trg_types: Column) -> Column:
    """Utils.getTypeSim (Utils.java:636-667) over two array<string> type
    columns: 1.0 on intersection, SHADING_TYPE_SIM on a shaded pair in
    either direction, else 0.0; null (no vote) when either side is null,
    empty, or contains ``no_type`` (Utils.hasEmptyType)."""
    untyped = (
        src_types.isNull()
        | trg_types.isNull()
        | (F.size(src_types) == 0)
        | (F.size(trg_types) == 0)
        | F.array_contains(src_types, NO_TYPE)
        | F.array_contains(trg_types, NO_TYPE)
    )
    direct = F.arrays_overlap(src_types, trg_types)
    shaded = F.arrays_overlap(_shaded(src_types), trg_types) | F.arrays_overlap(
        src_types, _shaded(trg_types)
    )
    return (
        F.when(untyped, F.lit(None).cast("double"))
        .when(direct, F.lit(1.0))
        .when(shaded, F.lit(SHADING_TYPE_SIM))
        .otherwise(F.lit(0.0))
    )
