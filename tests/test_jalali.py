"""Jalali calendar: golden docstring example + a pure-Python oracle swept
across 1970-2100 (leap-cycle edges included, e.g. Jalali 1403/1407)."""

import datetime

import pytest

import kolang_spark as ks


def py_jalali(g: datetime.date):
    """Independent pure-Python Gregorian→Jalali (classic day-number
    algorithm) used as the test oracle."""
    gy, gm, gd = g.year, g.month, g.day
    g_days_in_month = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]
    gy2 = gy - 1600
    days = 365 * gy2 + (gy2 + 3) // 4 - (gy2 + 99) // 100 + (gy2 + 399) // 400
    days += sum(g_days_in_month[: gm - 1]) + gd - 1
    if gm > 2 and ((gy % 4 == 0 and gy % 100 != 0) or gy % 400 == 0):
        days += 1
    j_day_no = days - 79
    j_np = j_day_no // 12053
    j_day_no %= 12053
    jy = 979 + 33 * j_np + 4 * (j_day_no // 1461)
    j_day_no %= 1461
    if j_day_no >= 366:
        jy += (j_day_no - 1) // 365
        j_day_no = (j_day_no - 1) % 365
    if j_day_no < 186:
        jm, jd = 1 + j_day_no // 31, 1 + j_day_no % 31
    else:
        jm, jd = 7 + (j_day_no - 186) // 30, 1 + (j_day_no - 186) % 30
    return jy, jm, jd


def test_jalali_golden_docstring(spark):
    df = (
        spark.createDataFrame([("2021-08-12",)], ["date"])
        .withColumn("s1", ks.jalali_date("date"))
        .withColumn("s2", ks.jalali_date("date", "%Y-%m"))
        .withColumn("s3", ks.jalali_date("date", "month:%m,day:%d"))
    )
    r = df.first()
    assert r.s1 == "1400-05-21"
    assert r.s2 == "1400-05"
    assert r.s3 == "month:05,day:21"


def test_jalali_oracle_sweep(spark):
    start = datetime.date(1970, 1, 1)
    dates = [start + datetime.timedelta(days=i * 137) for i in range(349)]  # → 2100
    df = spark.createDataFrame([(d.isoformat(),) for d in dates], ["date"])
    out = df.withColumn("j", ks.jalali_date("date")).collect()
    for row, d in zip(out, dates):
        jy, jm, jd = py_jalali(d)
        assert row.j == f"{jy:04d}-{jm:02d}-{jd:02d}", f"mismatch for {d}"


def test_jalali_leap_cycle_edges(spark):
    # Nowruz boundaries around the 1403 (leap) / 1404 transition and
    # century-rule Gregorian years
    cases = ["2024-03-19", "2024-03-20", "2025-03-20", "2025-03-21",
             "2000-03-19", "2000-03-20", "2100-03-20", "2100-03-21"]
    df = spark.createDataFrame([(c,) for c in cases], ["date"])
    got = [r.j for r in df.withColumn("j", ks.jalali_date("date")).collect()]
    expected = []
    for c in cases:
        jy, jm, jd = py_jalali(datetime.date.fromisoformat(c))
        expected.append(f"{jy:04d}-{jm:02d}-{jd:02d}")
    assert got == expected


def test_jalali_names_and_persian_digits(spark):
    df = spark.createDataFrame([("2021-08-12",)], ["date"])
    r = (
        df.withColumn("b", ks.jalali_date("date", "%B"))
        .withColumn("a", ks.jalali_date("date", "%A"))
        .withColumn("c", ks.jalali_date("date", "%C"))
        .withColumn("f", ks.jalali_date("date", "%fY-%fm-%fd"))
        .withColumn("y2", ks.jalali_date("date", "%y"))
        .first()
    )
    assert r.b == "مرداد"
    # 2021-08-12 is a Thursday → پنجشنبه
    assert r.a == "پنجشنبه"
    assert r.c == "تابستان"
    assert r.f == "۱۴۰۰-۰۵-۲۱"
    assert r.y2 == "00"


def test_gregorian_date_roundtrip_200_years(spark):
    """Every date 1900-01-01..2100-12-31 survives Gregorian → Jalali →
    Gregorian — pins both directions of the cycle arithmetic, including
    the 33-year leap edges (e.g. Jalali 1403/1408)."""
    import pyspark.sql.functions as F

    from kolang_spark.functions.jalali import gregorian_date, jalali_parts

    dates = spark.sql(
        "SELECT explode(sequence(DATE'1900-01-01', DATE'2100-12-31')) AS d"
    )
    jy, jm, jd = jalali_parts(F.col("d"))
    bad = (
        dates.select("d", gregorian_date(jy, jm, jd).alias("rt"))
        .where(F.col("d") != F.col("rt"))
        .count()
    )
    assert bad == 0


def test_parse_jalali_golden(spark):
    import datetime

    from kolang_spark.functions.jalali import parse_jalali

    df = spark.createDataFrame([("1400-05-21",), ("1403-01-01",)], "s string")
    got = [r["d"] for r in df.select(parse_jalali("s").alias("d")).collect()]
    assert got == [datetime.date(2021, 8, 12), datetime.date(2024, 3, 20)]
