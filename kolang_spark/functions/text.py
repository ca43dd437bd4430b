"""Persian/Arabic text normalization and string-shaped operators.

Parity targets: ``/root/reference/kolang/column_functions.py`` C4/C5/C7/
C11 (SURVEY §2.1). Pure ``translate`` / ``regexp_replace`` / ``split``
expression chains — JVM-side, codegen-friendly, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from kolang_spark.utils import ColumnOrName, to_col

__all__ = [
    "str_array_to_array",
    "number_normalizer",
    "text_cleaner",
    "persian_number",
]

ARABIC_DIGITS = "٠١٢٣٤٥٦٧٨٩"
PERSIAN_DIGITS = "۰۱۲۳۴۵۶۷۸۹"
ASCII_DIGITS = "0123456789"

# Arabic presentation variants → canonical Persian letters
_ARABIC_VARIANT_SRC = "كيأإؤةۀ"
_ARABIC_VARIANT_DST = "کیااوهه"


def str_array_to_array(col: ColumnOrName) -> Column:
    """Parse a ``"[a, b, c]"``-style string into ``array<string>``.

    Parity: ``kolang/column_functions.py:97-134`` (verified edge cases,
    SURVEY §2.1 C4): brackets stripped, ``"[]"``/``""``/NULL → NULL,
    separator is exactly ``", "``, inner quotes are preserved
    (``"['a']" → ["'a'"]``), bare scalar ``"a"`` → ``["a"]``.
    """
    stripped = F.translate(to_col(col), "[]", "")
    non_empty = F.when(stripped != "", stripped)
    return F.split(non_empty, ", ")


def number_normalizer(col: ColumnOrName) -> Column:
    """Transliterate Arabic-Indic and Persian digits to ASCII ``0-9``.

    Parity: ``kolang/column_functions.py:137-173``.
    """
    c = to_col(col)
    c = F.translate(c, ARABIC_DIGITS, ASCII_DIGITS)
    return F.translate(c, PERSIAN_DIGITS, ASCII_DIGITS)


def text_cleaner(col: ColumnOrName, accept: str = "") -> Column:
    """Strip a string down to digits + English + Persian letters (+spaces).

    Pipeline (parity: ``kolang/column_functions.py:218-252``):

    1. normalize Arabic/Persian digits to ASCII;
    2. map Arabic variant letters to canonical Persian;
    3. replace every char outside ``[a-zآ-یA-Z0-9 ]`` (plus ``accept``)
       with a space;
    4. collapse runs of 2+ spaces to one.

    Note the reference's exact char-class (including the ``آ-ی`` range
    and the trailing space) is preserved; ``accept`` is appended raw into
    the regex class, as in the reference.
    """
    c = number_normalizer(col)
    c = F.translate(c, _ARABIC_VARIANT_SRC, _ARABIC_VARIANT_DST)
    c = F.regexp_replace(c, f"[^a-zآ-یA-Z0-9 {accept}]", " ")
    return F.regexp_replace(c, " {2,}", " ")


def persian_number(col: ColumnOrName, format: str = "%d") -> Column:
    """printf-format a number, then transliterate digits to Persian.

    Parity: ``kolang/column_functions.py:334-350``.
    """
    c = F.format_string(format, to_col(col))
    return F.translate(c, ASCII_DIGITS, PERSIAN_DIGITS)
