"""Gregorian → Jalali (Solar Hijri) calendar conversion as pure Column algebra.

Parity: ``/root/reference/kolang/column_functions.py:353-486`` (C12 — the
one genuinely novel scalar function; no Spark built-in exists). Both this
and the reference implement the classic public-domain day-number
algorithm (33-year great cycles of 12053 days containing 4-year cycles of
1461 days) attributed to Pournader & Toossi's ``jalali.c``.

Everything is native ``year/dayofyear/floor/%/when`` arithmetic — zero
UDFs, fully codegen-able, scale-free (per-row scalar math).

Format mini-language (same directives as the reference):

``%d`` day (29) · ``%m`` month (03) · ``%y`` year %100 (00) · ``%Y``
full year (1400) · ``%B`` month name · ``%A`` weekday name · ``%C``
season name · ``%fd %fm %fy %fY`` Persian-digit variants.

Unlike the reference (which compiles the format into one
``format_string``), the format is tokenized and compiled into a
``concat`` of literal and computed segments — this keeps literal ``%``
characters safe and avoids printf entirely.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

from kolang_spark.functions.text import persian_number
from kolang_spark.utils import ColumnOrName, to_col

__all__ = ["jalali_date", "jalali_parts", "gregorian_date", "parse_jalali"]

JALALI_MONTHS = [
    "فروردین",
    "اردیبهشت",
    "خرداد",
    "تیر",
    "مرداد",
    "شهریور",
    "مهر",
    "آبان",
    "آذر",
    "دی",
    "بهمن",
    "اسفند",
]

# index 0 = Saturday (شنبه); Gregorian dayofweek (1=Sun..7=Sat) maps via %7
JALALI_WEEKDAYS = [
    "شنبه",
    "یکشنبه",
    "دوشنبه",
    "سه شنبه",
    "چهارشنبه",
    "پنجشنبه",
    "جمعه",
]

JALALI_SEASONS = ["بهار", "تابستان", "پاییز", "زمستان"]


def jalali_parts(col: ColumnOrName) -> Tuple[Column, Column, Column]:
    """Return ``(jy, jm, jd)`` integer Columns for a Gregorian date column.

    Day-number algorithm: days since the epoch anchor (Gregorian
    1600-01-01, offset so Jalali year 979 starts at day 0), then decompose
    into 33-year great cycles (12053 days) and 4-year leap cycles (1461
    days). Months: the first 186 days of the Jalali year are six 31-day
    months; the rest are 30-day months (Esfand holds 29 or 30 via the
    cycle arithmetic itself).
    """
    c = to_col(col)
    years_since_1600 = F.year(c) - 1600
    day_of_year0 = F.dayofyear(c) - 1

    gregorian_day_no = (
        365 * years_since_1600
        + F.floor((years_since_1600 + 3) / 4)
        - F.floor((years_since_1600 + 99) / 100)
        + F.floor((years_since_1600 + 399) / 400)
        + day_of_year0
    )
    jalali_day_no = gregorian_day_no - 79

    great_cycles = F.floor(jalali_day_no / 12053)
    # pmod, not %: Spark's % follows the dividend's sign, and
    # jalali_day_no is NEGATIVE for dates before 1600-03-20 (the
    # algorithm's epoch) — a signed remainder fed garbage into the
    # cycle decomposition for those dates. floor-division (F.floor of
    # the true division) already pairs correctly with pmod; every
    # later % operates on the now-non-negative remainder.
    rem = F.pmod(jalali_day_no, F.lit(12053))
    jy = 979 + 33 * great_cycles + 4 * F.floor(rem / 1461)
    rem = rem % 1461

    jy = F.when(rem >= 366, jy + F.floor((rem - 1) / 365)).otherwise(jy)
    rem = F.when(rem >= 366, (rem - 1) % 365).otherwise(rem)

    jm = F.when(rem < 186, F.floor(rem / 31) + 1).otherwise(
        F.floor((rem - 186) / 30) + 7
    )
    jd = F.when(rem < 186, rem % 31 + 1).otherwise((rem - 186) % 30 + 1)
    return jy.cast("int"), jm.cast("int"), jd.cast("int")


def gregorian_date(jy: ColumnOrName, jm: ColumnOrName, jd: ColumnOrName) -> Column:
    """Inverse of :func:`jalali_parts`: Jalali (year, month, day) integer
    columns → Gregorian ``date``.

    The extension the reference lacks (it only converts forward). The
    trick that keeps it tiny: reconstruct the Jalali day-number
    (365·y + 8 per 33-year cycle + the 4-year leap term + month offset),
    shift by the same 79-day epoch offset the forward pass uses, and let
    ``date_add`` from the Gregorian anchor 1600-01-01 do the entire
    Gregorian-side cycle decomposition. Pure arithmetic, zero UDFs.
    """
    y = to_col(jy).cast("long") - 979
    m = to_col(jm).cast("long")
    d = to_col(jd).cast("long")
    month_offset = F.when(m <= 6, (m - 1) * 31).otherwise(186 + (m - 7) * 30)
    j_day_no = (
        365 * y
        + F.floor(y / 33) * 8
        # pmod for the same pre-epoch reason as jalali_parts: y < 0
        # for Jalali years before 979, where a signed % would skew
        # the leap term
        + F.floor((F.pmod(y, F.lit(33)) + 3) / 4)
        + month_offset
        + d
        - 1
    )
    g_day_no = j_day_no + 79  # days since 1600-01-01
    return F.date_add(F.make_date(F.lit(1600), F.lit(1), F.lit(1)), g_day_no.cast("int"))


def parse_jalali(col: ColumnOrName) -> Column:
    """Parse a canonical ``%Y-%m-%d`` Jalali string (e.g. the default
    output of :func:`jalali_date`) back into a Gregorian ``date``."""
    c = to_col(col)
    parts = F.split(c, "-")
    return gregorian_date(
        F.element_at(parts, 1).cast("int"),
        F.element_at(parts, 2).cast("int"),
        F.element_at(parts, 3).cast("int"),
    )


# token → builder(jy, jm, jd, source_col) -> Column
def _token_builders() -> Dict[str, callable]:
    def pad2(c: Column) -> Column:
        return F.lpad(c.cast("string"), 2, "0")

    def weekday_name(src: Column) -> Column:
        return F.element_at(
            F.array(*[F.lit(x) for x in JALALI_WEEKDAYS]),
            (F.dayofweek(src) % 7 + 1).cast("int"),
        )

    return {
        "%fd": lambda jy, jm, jd, src: persian_number(jd, "%02d"),
        "%fm": lambda jy, jm, jd, src: persian_number(jm, "%02d"),
        "%fy": lambda jy, jm, jd, src: persian_number(jy % 100, "%02d"),
        "%fY": lambda jy, jm, jd, src: persian_number(jy, "%d"),
        "%d": lambda jy, jm, jd, src: pad2(jd),
        "%m": lambda jy, jm, jd, src: pad2(jm),
        "%y": lambda jy, jm, jd, src: pad2(jy % 100),
        "%Y": lambda jy, jm, jd, src: jy.cast("string"),
        "%B": lambda jy, jm, jd, src: F.element_at(
            F.array(*[F.lit(x) for x in JALALI_MONTHS]), jm
        ),
        "%A": lambda jy, jm, jd, src: weekday_name(src),
        "%C": lambda jy, jm, jd, src: F.element_at(
            F.array(*[F.lit(x) for x in JALALI_SEASONS]),
            (F.floor((jm - 1) / 3) + 1).cast("int"),
        ),
    }


_TOKEN_RE = re.compile("(%fd|%fm|%fy|%fY|%d|%m|%y|%Y|%B|%A|%C)")


def jalali_date(col: ColumnOrName, format: str = "%Y-%m-%d") -> Column:
    """Format a Gregorian date column as a Jalali date string.

    Golden example (reference docstring ``column_functions.py:389``):
    ``2021-08-12`` → ``1400-05-21``.
    """
    src = to_col(col)
    jy, jm, jd = jalali_parts(src)
    builders = _token_builders()

    parts: List[Column] = []
    for piece in _TOKEN_RE.split(format):
        if not piece:
            continue
        if piece in builders:
            parts.append(builders[piece](jy, jm, jd, src))
        else:
            parts.append(F.lit(piece))
    if not parts:
        return F.lit("")
    return F.concat(*parts)
