"""Golden tests for text operators (fixtures: reference docstrings)."""

import kolang_spark as ks


def col1(df, c):
    return [r[c] for r in df.collect()]


def test_str_array_to_array(spark):
    df = spark.createDataFrame(
        [
            ("['a', 'b', 'c']",),
            ("[QYYpm9yz, QYY9l2m1, QYYlm0C6]",),
            ("[]",),
            ("",),
            ("a",),
            (None,),
        ],
        ["str_array"],
    )
    out = df.withColumn("array", ks.str_array_to_array("str_array"))
    assert dict(out.dtypes)["array"] == "array<string>"
    got = col1(out, "array")
    assert got[0] == ["'a'", "'b'", "'c'"]  # inner quotes preserved
    assert got[1] == ["QYYpm9yz", "QYY9l2m1", "QYYlm0C6"]
    assert got[2] is None
    assert got[3] is None
    assert got[4] == ["a"]
    assert got[5] is None


def test_number_normalizer(spark):
    df = spark.createDataFrame(
        [("۰۹۱۲۴۱۷۸۷۵۷",), ("۲۴۱۷۷7656۱۲",), ("۲۴۱ a سلام ab8",), ("٣٤٥",)],
        ["s"],
    )
    got = col1(df.withColumn("n", ks.number_normalizer("s")), "n")
    assert got == ["09124178757", "24177765612", "241 a سلام ab8", "345"]


def test_text_cleaner(spark):
    df = spark.createDataFrame(
        [
            ("sjkdf sdk❤️❤️fskd j",),
            ("۷7۲ 67 gh^&g    df",),
            ("۱a%%!. سلام ab😂😂8()",),
        ],
        ["s"],
    )
    got = col1(df.withColumn("c", ks.text_cleaner("s")), "c")
    assert got == ["sjkdf sdk fskd j", "772 67 gh g df", "1a سلام ab 8 "]


def test_text_cleaner_accept(spark):
    df = spark.createDataFrame([("a.b,c",)], ["s"])
    got = col1(df.withColumn("c", ks.text_cleaner("s", accept=".")), "c")
    assert got == ["a.b c"]


def test_persian_number(spark):
    df = spark.createDataFrame([(29,), (3,)], "n int")
    got = col1(df.withColumn("p", ks.persian_number("n", "%02d")), "p")
    assert got == ["۲۹", "۰۳"]


def test_arabic_variant_letters(spark):
    df = spark.createDataFrame([("كيأإؤةۀ",)], ["s"])
    got = col1(df.withColumn("c", ks.text_cleaner("s")), "c")
    assert got == ["کیااوهه"]
