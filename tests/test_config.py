"""Config algebra tests — mirrors the reference's test_dict_tools.py
cases (inheritance precedence, defaults, null handling, tuple keys,
anchor independence)."""

import copy

from trollflow2_spark.config.product_list import read_product_list
from trollflow2_spark.config.work_items import (
    DEFAULT_FORMAT,
    flatten_product_list,
    get_config_value,
)

YAML_INHERITANCE = """
product_list:
  output_dir: /out
  fname_pattern: "global_pattern"
  min_coverage: 5.0
  areas:
    a1:
      areaname: a1
      min_coverage: 20.0
      products:
        p1:
          productname: p1
          fname_pattern: "product_pattern"
          formats:
            - format: tif
              writer: geotiff
              fname_pattern: "format_pattern"
            - format: nc
              writer: cf
        p2:
          productname: p2
common:
  sensor: avhrr
  fallback_key: common_value
"""


def test_inheritance_precedence():
    cfg = read_product_list(raw_string=YAML_INHERITANCE)
    leaves = list(flatten_product_list(cfg))
    assert len(leaves) == 3
    by_fmt = {(l["productname"], l["format"]): l for l in leaves}
    # format level wins over product over global
    assert by_fmt[("p1", "tif")]["fname_pattern"] == "format_pattern"
    assert by_fmt[("p1", "nc")]["fname_pattern"] == "product_pattern"
    assert by_fmt[("p2", "tif")]["fname_pattern"] == "global_pattern"
    # area overrides global
    assert all(l["min_coverage"] == 20.0 for l in leaves)
    # /common flows into every leaf
    assert all(l["sensor"] == "avhrr" for l in leaves)


def test_default_format():
    cfg = read_product_list(raw_string=YAML_INHERITANCE)
    leaves = list(flatten_product_list(cfg))
    p2 = [l for l in leaves if l["productname"] == "p2"][0]
    assert p2["format"] == DEFAULT_FORMAT["format"]
    assert p2["writer"] == DEFAULT_FORMAT["writer"]


def test_get_config_value_precedence():
    cfg = read_product_list(raw_string=YAML_INHERITANCE)
    path = ["product_list", "areas", "a1", "products", "p1"]
    assert get_config_value(cfg, path, "fname_pattern") == "product_pattern"
    assert get_config_value(cfg, path, "min_coverage") == 20.0
    assert get_config_value(cfg, path, "output_dir") == "/out"
    assert get_config_value(cfg, path, "fallback_key") == "common_value"
    assert get_config_value(cfg, path, "nope", default=42) == 42


def test_tuple_products_and_global_formats():
    plist = {
        "product_list": {
            "formats": [{"format": "png", "writer": "simple_image"}],
            "areas": {
                "a": {
                    "products": {
                        ("c1", "c2"): {"productname": "multi"},
                        "solo": {"productname": "solo"},
                    }
                }
            },
        }
    }
    leaves = list(flatten_product_list(plist))
    multi = [l for l in leaves if l["productname"] == "multi"][0]
    assert multi["product"] == ["c1", "c2"]
    assert multi["format"] == "png"
    solo = [l for l in leaves if l["productname"] == "solo"][0]
    assert solo["product"] == ["solo"]


def test_global_formats_deep_copied():
    """Mutating one leaf's format config must not leak into siblings
    (≙ reference tests/test_launcher.py:199-204 anchor independence)."""
    shared = {"format": "png", "writer": "simple_image"}
    plist = {
        "product_list": {
            "formats": [shared],
            "areas": {
                "a": {"products": {"p1": {"productname": "p1"}, "p2": {"productname": "p2"}}}
            },
        }
    }
    leaves = list(flatten_product_list(plist))
    leaves[0]["writer"] = "mutated"
    assert leaves[1]["writer"] == "simple_image"
    assert shared["writer"] == "simple_image"


def test_yaml_anchor_independence():
    yml = """
product_list:
  areas:
    a1: &anchor
      areaname: x
      products:
        p: {productname: p}
    a2: *anchor
"""
    cfg = read_product_list(raw_string=yml)
    cfg["product_list"]["areas"]["a1"]["areaname"] = "changed"
    assert cfg["product_list"]["areas"]["a2"]["areaname"] == "x"


def test_null_area_key_becomes_string_none():
    """A null area key means "keep native projection"; it must survive as
    the addressable string key "None" (reference: launcher.py:460-480,
    null-area lookup tests/test_dict_tools.py:237-243)."""
    cfg = read_product_list(
        raw_string="product_list:\n  areas:\n    null:\n      products:\n        p1: {}\n    a: {}\n"
    )
    assert None not in cfg["product_list"]["areas"]
    assert "None" in cfg["product_list"]["areas"]
    leaves = list(flatten_product_list(cfg))
    assert any(lf["area"] == "None" for lf in leaves)


def test_null_key_rewrite_is_line_anchored():
    """Keys merely ending in 'null' and string values containing 'null:'
    must survive the null-key rewrite untouched (round-1 defect: a blind
    str.replace corrupted both)."""
    from trollflow2_spark.config.product_list import read_product_list

    raw = (
        "product_list:\n"
        "  mynull: keepme\n"
        "  note: 'contains null: inside a value'\n"
        "  areas:\n"
        "    null:\n"
        "      products: {}\n"
    )
    cfg = read_product_list(raw_string=raw)
    pl = cfg["product_list"]
    assert pl["mynull"] == "keepme"
    assert pl["note"] == "contains null: inside a value"
    assert "None" in pl["areas"] and None not in pl["areas"]


def test_work_items_df(spark):
    from trollflow2_spark.queries import CANONICAL_PRODUCT_LIST, q_work_items_flatten

    df = q_work_items_flatten(spark, "")
    rows = {(r["area"], r["productname"], r["format"]) for r in df.collect()}
    assert ("euron1", "cloud_top_height", "tif") in rows
    assert ("germ", "double_channels", "png") in rows
    assert len(rows) == 6
