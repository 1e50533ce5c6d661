"""Schema catalog: explicit StructTypes + the Edm source-type mapping.

The reference discovers schemas at runtime from the OData ``$metadata``
XML and caches them in MongoDB (reference resources/priorityDataSource.py:347-458),
then trusts the cache for DDL and dtype enforcement. Our equivalent is an
explicit, in-code catalog: a ``StructType`` per table (never
``inferSchema`` — parquet footers are self-describing, and for non-self-
describing sources the catalog is authoritative) plus the four-entry
Edm→Spark type mapping (reference resources/static/datatypesConvert.json:2-37).

Scale note: an explicit schema means the scan can prune columns/row groups
from the parquet footer without a sampling pass — at 100 TB an
``inferSchema`` pre-read is a full extra scan.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Edm → Spark type mapping (the reference's datatypeMapping table,
# resources/static/datatypesConvert.json:2-37, as a plain dict — no eval()).
# ---------------------------------------------------------------------------

EDM_TO_SPARK: dict[str, T.DataType] = {
    "Edm.String": T.StringType(),
    "Edm.Decimal": T.DecimalType(38, 6),
    "Edm.DateTimeOffset": T.TimestampType(),
    "Edm.Int64": T.LongType(),
    # Extensions beyond the reference's four-entry mapping: the OData v4
    # CSDL primitives a real $metadata can declare (the reference simply
    # never met them). Round 11 (protocol review) completes the set —
    # Guid keys in particular are ubiquitous and previously made the
    # whole entity unreadable.
    "Edm.Int32": T.IntegerType(),
    "Edm.Double": T.DoubleType(),
    "Edm.Boolean": T.BooleanType(),
    "Edm.Guid": T.StringType(),        # canonical 8-4-4-4-12 text form
    "Edm.Date": T.DateType(),
    "Edm.Int16": T.ShortType(),
    "Edm.Single": T.FloatType(),
    "Edm.SByte": T.ByteType(),         # [-128, 127] — exact
    "Edm.Byte": T.ShortType(),         # [0, 255] needs the wider type
    "Edm.Binary": T.BinaryType(),
    # no native Spark type; ISO-8601 text round-trips losslessly
    "Edm.TimeOfDay": T.StringType(),
    "Edm.Duration": T.StringType(),
}

# SQL dialect strings for the sink-DDL boundary (reference keeps per-dialect
# columns MySQLDatatype/postgresDatatype/AzureSQLDatatype in the mapping docs).
EDM_TO_SQL: dict[str, dict[str, str]] = {
    "Edm.String": {"azuresql": "VARCHAR(MAX)", "postgres": "VARCHAR", "spark": "STRING"},
    "Edm.Decimal": {"azuresql": "NUMERIC(38,6)", "postgres": "NUMERIC", "spark": "DECIMAL(38,6)"},
    "Edm.DateTimeOffset": {"azuresql": "DATETIMEOFFSET", "postgres": "TIMESTAMP", "spark": "TIMESTAMP"},
    "Edm.Int64": {"azuresql": "BIGINT", "postgres": "BIGINT", "spark": "BIGINT"},
    "Edm.Int32": {"azuresql": "INT", "postgres": "INTEGER", "spark": "INT"},
    "Edm.Double": {"azuresql": "FLOAT", "postgres": "DOUBLE PRECISION", "spark": "DOUBLE"},
    "Edm.Boolean": {"azuresql": "BIT", "postgres": "BOOLEAN", "spark": "BOOLEAN"},
    "Edm.Guid": {"azuresql": "UNIQUEIDENTIFIER", "postgres": "UUID", "spark": "STRING"},
    "Edm.Date": {"azuresql": "DATE", "postgres": "DATE", "spark": "DATE"},
    "Edm.Int16": {"azuresql": "SMALLINT", "postgres": "SMALLINT", "spark": "SMALLINT"},
    "Edm.Single": {"azuresql": "REAL", "postgres": "REAL", "spark": "FLOAT"},
    "Edm.SByte": {"azuresql": "SMALLINT", "postgres": "SMALLINT", "spark": "TINYINT"},
    "Edm.Byte": {"azuresql": "SMALLINT", "postgres": "SMALLINT", "spark": "SMALLINT"},
    "Edm.Binary": {"azuresql": "VARBINARY(MAX)", "postgres": "BYTEA", "spark": "BINARY"},
    "Edm.TimeOfDay": {"azuresql": "TIME", "postgres": "TIME", "spark": "STRING"},
    "Edm.Duration": {"azuresql": "VARCHAR(64)", "postgres": "INTERVAL", "spark": "STRING"},
}


def edm_to_spark(edm_type: str) -> T.DataType:
    """Map an Edm source type to its Spark type (O11 in SURVEY.md §2)."""
    try:
        return EDM_TO_SPARK[edm_type]
    except KeyError:
        raise ValueError(f"unmapped source type {edm_type!r}; known: {sorted(EDM_TO_SPARK)}")


# ---------------------------------------------------------------------------
# Fixture-table schemas — mirror the parquet footers at /root/testdata/sf*/
# exactly (verified against pyarrow). These double as the "entity metadata"
# catalog: name, fields, and primary key per entity.
# ---------------------------------------------------------------------------

_f = T.StructField

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType([
        _f("r_regionkey", T.IntegerType()),
        _f("r_name", T.StringType()),
    ]),
    "nation": T.StructType([
        _f("n_nationkey", T.IntegerType()),
        _f("n_name", T.StringType()),
        _f("n_regionkey", T.IntegerType()),
    ]),
    "customer": T.StructType([
        _f("c_custkey", T.LongType()),
        _f("c_name", T.StringType()),
        _f("c_nationkey", T.IntegerType()),
        _f("c_acctbal", T.DoubleType()),
        _f("c_mktsegment", T.StringType()),
    ]),
    "supplier": T.StructType([
        _f("s_suppkey", T.LongType()),
        _f("s_name", T.StringType()),
        _f("s_nationkey", T.IntegerType()),
        _f("s_acctbal", T.DoubleType()),
    ]),
    "part": T.StructType([
        _f("p_partkey", T.LongType()),
        _f("p_name", T.StringType()),
        _f("p_brand", T.StringType()),
        _f("p_type", T.StringType()),
        _f("p_size", T.IntegerType()),
        _f("p_retailprice", T.DoubleType()),
    ]),
    "orders": T.StructType([
        _f("o_orderkey", T.LongType()),
        _f("o_custkey", T.LongType()),
        _f("o_orderstatus", T.StringType()),
        _f("o_totalprice", T.DoubleType()),
        _f("o_orderdate", T.TimestampType()),
        _f("o_orderpriority", T.StringType()),
    ]),
    "lineitem": T.StructType([
        _f("l_orderkey", T.LongType()),
        _f("l_partkey", T.LongType()),
        _f("l_suppkey", T.LongType()),
        _f("l_linenumber", T.IntegerType()),
        _f("l_quantity", T.DoubleType()),
        _f("l_extendedprice", T.DoubleType()),
        _f("l_discount", T.DoubleType()),
        _f("l_tax", T.DoubleType()),
        _f("l_returnflag", T.StringType()),
        _f("l_linestatus", T.StringType()),
        _f("l_shipdate", T.TimestampType()),
    ]),
    "events": T.StructType([
        _f("event_id", T.LongType()),
        _f("ts", T.TimestampType()),
        _f("user_id", T.LongType()),
        _f("event_type", T.StringType()),
        _f("value", T.DoubleType()),
        _f("props", T.StringType()),
    ]),
    "documents": T.StructType([
        _f("doc_id", T.LongType()),
        _f("text", T.StringType()),
        _f("lang", T.StringType()),
        _f("source", T.StringType()),
        _f("n_chars", T.LongType()),
    ]),
    "embeddings": T.StructType([
        _f("vec_id", T.LongType()),
        _f("embedding", T.ArrayType(T.FloatType())),
        _f("label", T.IntegerType()),
    ]),
}

# Entity primary keys (EntityPk in the reference's metadata docs,
# reference resources/priorityDataSource.py:452-455). Drives MERGE dedup and
# the sink-DDL PK→varchar(255) rule (reference resources/sqlDwh.py:368-370).
PRIMARY_KEYS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

TABLES: tuple[str, ...] = tuple(SCHEMAS)


def schema_for(table: str) -> T.StructType:
    try:
        return SCHEMAS[table]
    except KeyError:
        raise ValueError(f"unknown table {table!r}; known: {sorted(SCHEMAS)}")


def primary_key(table: str) -> list[str]:
    return list(PRIMARY_KEYS[table])


def parse_edmx(edmx_xml: str, source_system: str = "odata") -> list[dict]:
    """Parse OData ``$metadata`` EDMX XML into entity-metadata docs (O2).

    The reference fetches ``<serviceRoot>/$metadata`` and xmltodict-parses
    ``edmx:Edmx → edmx:DataServices → Schema → EntityType`` into one doc
    per entity with ``Fields`` (fieldName / SourceDataType / desc /
    KeyFlag) and ``EntityPk`` (reference resources/priorityDataSource.py:347-458;
    doc shape example readme.md:518-551). This is the same extraction on
    stdlib ElementTree, namespace-agnostic (matches on local names), and
    handles the reference's edge cases: single vs multiple ``PropertyRef``
    keys, keyless entities, and single-property entities.

    Output feeds ``struct_type_from_metadata`` + ``PRIMARY_KEYS``-style
    lookups — metadata discovery for any real OData source, where the
    fixture tables instead use the explicit SCHEMAS catalog.
    """
    import xml.etree.ElementTree as ET

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    def annotation_string(el) -> str | None:
        for child in el:
            if local(child.tag) == "Annotation" and child.get("String") is not None:
                return child.get("String")
        return None

    root = ET.fromstring(edmx_xml)
    raw: dict[str, dict] = {}
    order: list[str] = []
    for entity_el in root.iter():
        if local(entity_el.tag) != "EntityType":
            continue
        name = entity_el.get("Name")
        keys: list[str] = []
        fields: list[dict] = []
        for child in entity_el:
            tag = local(child.tag)
            if tag == "Key":
                keys += [
                    ref.get("Name")
                    for ref in child
                    if local(ref.tag) == "PropertyRef" and ref.get("Name")
                ]
            elif tag == "Property":
                fld = {
                    "fieldName": child.get("Name"),
                    "SourceDataType": child.get("Type"),
                }
                desc = annotation_string(child)
                if desc is not None:
                    fld["desc"] = desc
                fields.append(fld)
        raw[name] = {
            "name": name,
            # CSDL BaseType is namespace-qualified ("NS.Base")
            "base": (entity_el.get("BaseType") or "").rsplit(".", 1)[-1] or None,
            "keys": keys,
            "fields": fields,
            "desc": annotation_string(entity_el),
        }
        order.append(name)

    def resolve(name: str, seen: tuple = ()) -> tuple[list[str], list[dict]]:
        # BaseType inheritance (round-11 protocol review): derived
        # entities inherit the base chain's key and properties — ignoring
        # BaseType silently DROPPED every inherited column from every row
        # and lost the key (degrading the reader to the unbounded
        # single-pull path). Base fields come first, spec declaration
        # order; unknown bases and cycles fail loud.
        if name in seen:
            raise ValueError(f"EDMX BaseType cycle at {name!r}")
        ent = raw[name]
        if not ent["base"]:
            return list(ent["keys"]), list(ent["fields"])
        if ent["base"] not in raw:
            raise ValueError(
                f"EDMX entity {name!r} derives from unknown BaseType "
                f"{ent['base']!r}"
            )
        bkeys, bfields = resolve(ent["base"], seen + (name,))
        return (ent["keys"] or bkeys), bfields + list(ent["fields"])

    entities: list[dict] = []
    by_name: dict[str, dict] = {}
    for name in order:
        keys, fields = resolve(name)
        fields = [dict(f) for f in fields]
        for fld in fields:
            fld["KeyFlag"] = fld["fieldName"] in keys
        entity = {
            "_id": name,
            "sourceSystem": source_system,
            "Fields": fields,
            "EntityPk": [f["fieldName"] for f in fields if f["KeyFlag"]],
        }
        if raw[name]["desc"] is not None:
            entity["desc"] = raw[name]["desc"]
        entities.append(entity)
        by_name[name.lower()] = entity

    # EntityContainer/EntitySet aliases (round-11 protocol review):
    # OData URLs address ENTITY SETS, whose names routinely differ from
    # their EntityType (the spec's own example: EntitySet 'Orders' of
    # type 'NS.Order'). Emit an alias doc per differently-named set so
    # callers can pass the addressable name; 'EntityTypeName' records
    # the underlying type. Priority-style same-name services are
    # unaffected (alias would collide, so it is skipped).
    for set_el in root.iter():
        if local(set_el.tag) != "EntitySet":
            continue
        set_name = set_el.get("Name")
        type_name = (set_el.get("EntityType") or "").rsplit(".", 1)[-1]
        if not set_name or not type_name:
            continue
        base = by_name.get(type_name.lower())
        if base is None or set_name.lower() in by_name:
            continue
        alias = dict(base)
        alias["_id"] = set_name
        alias["EntityTypeName"] = type_name
        entities.append(alias)
        by_name[set_name.lower()] = alias
    return entities


def struct_type_from_metadata(fields: list[dict]) -> T.StructType:
    """Build a StructType from a reference-shaped entity-metadata doc.

    ``fields`` items look like ``{"fieldName": ..., "SourceDataType":
    "Edm.*", "KeyFlag": bool}`` (reference resources/priorityDataSource.py:390-417,
    example readme.md:518-551). Names are lowercased here — the engine
    normalizes all identifiers to lowercase (O9).
    """
    return T.StructType([
        _f(fld["fieldName"].lower(), edm_to_spark(fld["SourceDataType"]), True)
        for fld in fields
    ])


def schema_drift(
    old_fields: list[dict], new_fields: list[dict]
) -> list[dict]:
    """Diff two entity-metadata docs (``parse_edmx`` field lists) into a
    drift report — what a production pipeline must check each run
    before trusting yesterday's staging DDL, since the reference
    re-fetches ``$metadata`` but silently assumes it never changes.

    One dict per drifted field: ``{"fieldName", "change", "old_type",
    "new_type", "breaking"}`` with change ∈ added / removed / retyped /
    key_changed. Breaking = removed, retyped to an incompatible Spark
    type (anything but a widening numeric promotion), or any key
    change — the cases where the staging MERGE would corrupt rather
    than append. Names compare lowercased (O9 normalization).
    """
    widening = {
        ("smallint", "int"), ("smallint", "bigint"), ("int", "bigint"),
        ("float", "double"), ("int", "double"), ("bigint", "double"),
    }

    def by_name(fields):
        return {
            f["fieldName"].lower(): (
                edm_to_spark(f["SourceDataType"]).simpleString(),
                bool(f.get("KeyFlag")),
            )
            for f in fields
        }

    old, new = by_name(old_fields), by_name(new_fields)
    out = []
    for name in sorted(old.keys() | new.keys()):
        if name not in new:
            out.append({"fieldName": name, "change": "removed",
                        "old_type": old[name][0], "new_type": None,
                        "breaking": True})
        elif name not in old:
            out.append({"fieldName": name, "change": "added",
                        "old_type": None, "new_type": new[name][0],
                        "breaking": False})
        else:
            (ot, ok), (nt, nk) = old[name], new[name]
            if ok != nk:
                out.append({"fieldName": name, "change": "key_changed",
                            "old_type": ot, "new_type": nt,
                            "breaking": True})
            elif ot != nt:
                out.append({"fieldName": name, "change": "retyped",
                            "old_type": ot, "new_type": nt,
                            "breaking": (ot, nt) not in widening})
    return out
