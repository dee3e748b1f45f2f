"""XML (de)serialization for the item-record REST boundary.

The reference parses the fetched Alma XML with ElementTree, pulls the
``link`` attribute (per-item update URL) and the ``item_data`` subtree
(BatchUpdate.py:484-488), and serializes the merged tree back with
``ET.tostring`` (:553).

Engine shape: the record is a nested struct column end-to-end; XML
exists only at the REST edge. Parsing uses Spark 4's built-in
``from_xml``; serialization renders a deterministic template with
``format_string`` (the merge logic never touches XML).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ITEM_XML_SCHEMA = (
    "struct<"
    "_link: string, "
    "item_data: struct<"
    "barcode: string, "
    "physical_material_type: struct<_desc: string, _VALUE: string>, "
    "policy: struct<_desc: string, _VALUE: string>, "
    "enumeration_a: string, enumeration_b: string, "
    "chronology_i: string, chronology_j: string>>"
)


def xml_parse(xml_col: Column) -> Column:
    """Fetched XML → nested struct (link attr + item_data subtree)."""
    return F.from_xml(xml_col, ITEM_XML_SCHEMA)


def xml_serialize(
    link: Column,
    barcode: Column,
    mat_code: Column,
    mat_desc: Column,
    pol_code: Column,
    pol_desc: Column,
    enum_a: Column,
    enum_b: Column,
    chron_i: Column,
    chron_j: Column,
) -> Column:
    """Merged record → the XML body the PUT sink sends.

    A format_string template keeps serialization in codegen; element
    order and shape mirror the subset of the Alma item record the
    reference edits (BatchUpdate.py:494-550).
    """
    return F.format_string(
        '<item link="%s"><item_data><barcode>%s</barcode>'
        '<physical_material_type desc="%s">%s</physical_material_type>'
        '<policy desc="%s">%s</policy>'
        "<enumeration_a>%s</enumeration_a><enumeration_b>%s</enumeration_b>"
        "<chronology_i>%s</chronology_i><chronology_j>%s</chronology_j>"
        "</item_data></item>",
        link, barcode, mat_desc, mat_code, pol_desc, pol_code,
        enum_a, enum_b, chron_i, chron_j,
    )
