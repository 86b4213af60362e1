"""Product-list (the engine's "query") loader.

A product list is a hierarchical YAML config:

    product_list:
      output_dir: /tmp/out
      areas:
        euron1:
          areaname: euron1
          products:
            overview:
              productname: overview
              formats:
                - format: tif
                  writer: geotiff

Semantics reproduced from the reference (cited for parity, not copied):

- YAML anchors/aliases must become *independent* nodes after load, so a
  per-leaf mutation can't leak through a shared alias
  (``/root/reference/trollflow2/launcher.py:331-341``; independence
  asserted in ``tests/test_launcher.py:199-204``).
- A ``!tuple`` tag turns a YAML list into a tuple product key — several
  channels written to one output file
  (``/root/reference/trollflow2/launcher.py:63-77``).
- A literal ``null:`` mapping key is rewritten to the *string* key
  ``"None"`` before parsing — the reference's workaround so a null area
  (= keep native projection, no resampling) survives as a named area
  (``launcher.py:460-480``, null-area lookup
  ``tests/test_dict_tools.py:237-243``).

Unlike the reference we never use an unsafe loader: pipelines reference
registered stage names instead of arbitrary ``!!python/name`` callables
(a deliberate safety improvement over ``launcher.py:404``).
"""

from __future__ import annotations

import copy
import re
from typing import Any

import yaml


def tuple_constructor(loader: yaml.Loader, node: yaml.Node) -> tuple:
    """``!tuple [a, b]`` or ``!tuple ("a", "b")`` -> ``("a", "b")``."""
    if isinstance(node, yaml.SequenceNode):
        return tuple(loader.construct_sequence(node))
    # scalar form: "(a, b)" — strip parens, split on commas
    raw = loader.construct_scalar(node)
    inner = raw.strip().strip("()")
    return tuple(part.strip().strip("'\"") for part in inner.split(",") if part.strip())


class _ProductListLoader(yaml.SafeLoader):
    """SafeLoader + !tuple. Never UnsafeLoader."""


_ProductListLoader.add_constructor("!tuple", tuple_constructor)


def expand_aliases(obj: Any) -> Any:
    """Deep-copy shared (anchor/alias) nodes so every node is independent."""
    if isinstance(obj, dict):
        return {k: expand_aliases(copy.deepcopy(v)) for k, v in obj.items()}
    if isinstance(obj, list):
        return [expand_aliases(copy.deepcopy(v)) for v in obj]
    return obj


_NULL_KEY_RE = re.compile(r"^(\s*(?:-\s+)?)null:", flags=re.MULTILINE)


def _rewrite_null_keys(raw: str) -> str:
    """``null:`` mapping keys -> string ``None:`` keys so the null
    ("satellite projection") area stays addressable (≙ the reference's
    ``_remove_null_keys`` quirk in ``launcher.py``).

    Line-anchored: only a key that IS ``null`` at the start of a line is
    rewritten — keys merely *ending* in ``null`` (``mynull:``) and string
    *values* containing ``"null:"`` pass through untouched."""
    return _NULL_KEY_RE.sub(r"\1None:", raw)


def read_product_list(fname: str | None = None, raw_string: str | None = None) -> dict:
    """Load a product-list YAML from a path or a raw string."""
    if raw_string is not None:
        text = raw_string
    else:
        with open(fname, "r", encoding="utf-8") as fh:
            text = fh.read()
    cfg = yaml.load(_rewrite_null_keys(text), Loader=_ProductListLoader)
    return expand_aliases(cfg)
