"""Field-name alias generation (SURVEY §2.8 "snake/camel aliasing";
reference /root/reference/src/llm_scraper/utils/aliases.py:7-39 —
pydantic alias_generators-derived). In the reference this drives pydantic
field aliases; here it is the schema-authoring helper for renaming
DataFrame columns between storage conventions (e.g. camelCase JSON feeds
-> snake_case parquet columns).

Semantics-exact to the reference (tests/test_ops.py imports the actual
reference module by path and asserts equality on generated names):
``clean`` maps punctuation and space runs to single underscores;
``to_snake_case`` splits ALLCAPSWord and lowerUpper boundaries, maps
hyphens, lowercases; camel/pascal rebuild from underscore-split words via
str.capitalize (which lowercases the tail — upstream behavior kept).
"""

from __future__ import annotations

import re
import string

from pyspark.sql import DataFrame

_SPACE_RUN = re.compile(r" +")
_UNDERSCORE_RUN = re.compile(r"_+")
_CAPS_BOUNDARY = re.compile(r"([A-Z]+)([A-Z][a-z])")
_LOWER_UPPER = re.compile(r"([a-z\d])([A-Z])")


def clean(name: str, is_stripped: bool = False) -> str:
    for ch in string.punctuation:
        name = name.replace(ch, "_")
    name = _SPACE_RUN.sub("_", name)
    name = _UNDERSCORE_RUN.sub("_", _SPACE_RUN.sub("_", name))
    if is_stripped and name.startswith("_"):
        return name[1:]
    return name


def to_snake_case(name: str) -> str:
    name = _CAPS_BOUNDARY.sub(r"\1_\2", name)
    name = _LOWER_UPPER.sub(r"\1_\2", name)
    return name.replace("-", "_").lower()


def to_camel_case(name: str) -> str:
    words = name.split("_")
    return "".join(w.capitalize() if i > 0 else w for i, w in enumerate(words))


def to_pascal_case(name: str) -> str:
    return "".join(w.capitalize() for w in name.split("_"))


_STYLES = {
    "snake": to_snake_case,
    "camel": to_camel_case,
    "pascal": to_pascal_case,
}


def alias_columns(df: DataFrame, style: str = "snake") -> DataFrame:
    """Rename every column to the given naming style — pure metadata
    (Project of aliases; no shuffle, no data movement)."""
    fn = _STYLES[style]
    return df.toDF(*[fn(c) for c in df.columns])
