"""Pins for the scalar stragglers: luhn_check (expression), word_stem
(Porter pandas UDF), HMAC family (RFC 4231/2202 vectors), base32 codecs.
References: LuhnCheckFunction.java:25, WordStemFunction.java:51,
HmacFunctions.java:1, VarbinaryFunctions.java:41."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from trino_spark.functions import crypto
from trino_spark.functions.stem import porter_stem, word_stem
from trino_spark.functions.strings import luhn_check


def test_luhn_known_numbers(spark):
    cases = {
        "79927398713": True,   # canonical Luhn example
        "79927398710": False,
        "4532015112830366": True,  # Visa test number
        "1234567812345670": True,
        "1234567812345678": False,
        "0": True,
        "abc": None,
        "": False,
    }
    df = spark.createDataFrame([Row(s=k) for k in cases])
    got = {r.s: r.ok for r in df.select("s", luhn_check("s").alias("ok")).collect()}
    assert got == cases


def test_porter_stem_vocabulary():
    # Published examples from Porter (1980) "An algorithm for suffix stripping"
    cases = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster", "motoring": "motor",
        "conflated": "conflat", "sized": "size", "hopping": "hop", "falling": "fall",
        "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
        "vietnamization": "vietnam", "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "triplicate": "triplic", "formative": "form",
        "electrical": "electr", "hopeful": "hope", "goodness": "good",
        "adjustable": "adjust", "replacement": "replac", "adoption": "adopt",
        "activate": "activ", "effective": "effect", "probate": "probat",
        "rate": "rate", "cease": "ceas", "roll": "roll", "presentations": "present",
    }
    for w, expect in cases.items():
        assert porter_stem(w) == expect, w


def test_word_stem_udf(spark):
    df = spark.createDataFrame(
        [Row(w="presentations"), Row(w="Motoring"), Row(w="can't"), Row(w=None)]
    )
    got = [r.s for r in df.select(word_stem("w").alias("s")).collect()]
    assert got == ["present", "motor", "can't", None]


def test_hmac_rfc_vectors(spark):
    # RFC 4231 test case 2: key "Jefe", data "what do ya want for nothing?"
    df = spark.createDataFrame([Row(d=b"what do ya want for nothing?", k=b"Jefe")])
    out = df.select(
        F.hex(crypto.hmac_sha256("d", "k")).alias("h256"),
        F.hex(crypto.hmac_md5("d", "k")).alias("hmd5"),
    ).first()
    assert out.h256.lower() == (
        "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843"
    )
    # RFC 2202 test case 2 for HMAC-MD5
    assert out.hmd5.lower() == "750c783e6ab0b503eaa86e310a5db738"


def test_base32_roundtrip(spark):
    df = spark.createDataFrame([Row(b=b"hello world"), Row(b=b""), Row(b=None)])
    out = df.select(
        crypto.to_base32("b").alias("enc"),
        crypto.from_base32(crypto.to_base32("b")).alias("back"),
    ).collect()
    assert out[0].enc == "NBSWY3DPEB3W64TMMQ======"
    assert bytes(out[0].back) == b"hello world"
    assert out[1].enc == "" and bytes(out[1].back) == b""
    assert out[2].enc is None and out[2].back is None


class TestSpookyHashV2:
    """spooky_hash_v2_32/64 (VarbinaryFunctions.java) — digests pinned
    from the reference's TestVarbinaryFunctions.java:783-797. Short path
    (<192 B) is vector-verified; long path follows the published
    constants (functions/spooky.py docstring flags the split)."""

    def test_reference_vectors(self, spark):
        from trino_spark.dialect.engine import TrinoEngine

        eng = TrinoEngine(spark)
        r = eng.sql(
            "SELECT hex(spooky_hash_v2_32(CAST('' AS VARBINARY))) AS a,"
            " hex(spooky_hash_v2_32(CAST('hello' AS VARBINARY))) AS b,"
            " hex(spooky_hash_v2_64(CAST('' AS VARBINARY))) AS c,"
            " hex(spooky_hash_v2_64(CAST('hello' AS VARBINARY))) AS d"
        ).collect()[0]
        assert r.a == "6BF50919"
        assert r.b == "D382E6CA"
        assert r.c == "232706FC6BF50919"
        assert r.d == "3768826AD382E6CA"

    def test_boundary_lengths_deterministic(self, spark):
        from trino_spark.functions import spooky as S

        for n in (0, 1, 7, 8, 15, 16, 17, 31, 32, 191, 192, 193, 287, 288):
            data = bytes((i * 7 + 3) % 256 for i in range(n))
            assert S.hash64(data) == S.hash64(bytes(data))
            assert S.hash32(data) == S.hash64(data) & 0xFFFFFFFF

    def test_long_path_vs_unrolled_transcription(self):
        """Round-6: the reference's own suite pins NO >= 192 B vector
        (TestVarbinaryFunctions.java:786-796 — every input <= 5 bytes),
        and no second SpookyV2 implementation exists in this container,
        so the strongest offline evidence for the long path is a
        DIFFERENT-SHAPED transcription of Bob Jenkins' published
        spooky.cpp: the unrolled Mix / EndPartial statement lists below
        are copied line-for-line from the public source, while
        functions/spooky.py uses modular-index loops. Agreement across
        the whole long domain (block boundaries, partial tails, seeds)
        rules out loop-refactoring transcription errors."""
        import struct

        from trino_spark.functions import spooky as S

        M = (1 << 64) - 1
        SC = 0xDEADBEEFDEADBEEF

        def rot(x, k):
            return ((x << k) | (x >> (64 - k))) & M

        def mix(d, h):
            # spooky.cpp SpookyHash::Mix, verbatim statement order
            h[0] = (h[0] + d[0]) & M; h[2] ^= h[10]; h[11] ^= h[0]; h[0] = rot(h[0], 11); h[11] = (h[11] + h[1]) & M
            h[1] = (h[1] + d[1]) & M; h[3] ^= h[11]; h[0] ^= h[1]; h[1] = rot(h[1], 32); h[0] = (h[0] + h[2]) & M
            h[2] = (h[2] + d[2]) & M; h[4] ^= h[0]; h[1] ^= h[2]; h[2] = rot(h[2], 43); h[1] = (h[1] + h[3]) & M
            h[3] = (h[3] + d[3]) & M; h[5] ^= h[1]; h[2] ^= h[3]; h[3] = rot(h[3], 31); h[2] = (h[2] + h[4]) & M
            h[4] = (h[4] + d[4]) & M; h[6] ^= h[2]; h[3] ^= h[4]; h[4] = rot(h[4], 17); h[3] = (h[3] + h[5]) & M
            h[5] = (h[5] + d[5]) & M; h[7] ^= h[3]; h[4] ^= h[5]; h[5] = rot(h[5], 28); h[4] = (h[4] + h[6]) & M
            h[6] = (h[6] + d[6]) & M; h[8] ^= h[4]; h[5] ^= h[6]; h[6] = rot(h[6], 39); h[5] = (h[5] + h[7]) & M
            h[7] = (h[7] + d[7]) & M; h[9] ^= h[5]; h[6] ^= h[7]; h[7] = rot(h[7], 57); h[6] = (h[6] + h[8]) & M
            h[8] = (h[8] + d[8]) & M; h[10] ^= h[6]; h[7] ^= h[8]; h[8] = rot(h[8], 55); h[7] = (h[7] + h[9]) & M
            h[9] = (h[9] + d[9]) & M; h[11] ^= h[7]; h[8] ^= h[9]; h[9] = rot(h[9], 54); h[8] = (h[8] + h[10]) & M
            h[10] = (h[10] + d[10]) & M; h[0] ^= h[8]; h[9] ^= h[10]; h[10] = rot(h[10], 22); h[9] = (h[9] + h[11]) & M
            h[11] = (h[11] + d[11]) & M; h[1] ^= h[9]; h[10] ^= h[11]; h[11] = rot(h[11], 46); h[10] = (h[10] + h[0]) & M

        def end_partial(h):
            # spooky.cpp SpookyHash::EndPartial, verbatim statement order
            h[11] = (h[11] + h[1]) & M; h[2] ^= h[11]; h[1] = rot(h[1], 44)
            h[0] = (h[0] + h[2]) & M; h[3] ^= h[0]; h[2] = rot(h[2], 15)
            h[1] = (h[1] + h[3]) & M; h[4] ^= h[1]; h[3] = rot(h[3], 34)
            h[2] = (h[2] + h[4]) & M; h[5] ^= h[2]; h[4] = rot(h[4], 21)
            h[3] = (h[3] + h[5]) & M; h[6] ^= h[3]; h[5] = rot(h[5], 38)
            h[4] = (h[4] + h[6]) & M; h[7] ^= h[4]; h[6] = rot(h[6], 33)
            h[5] = (h[5] + h[7]) & M; h[8] ^= h[5]; h[7] = rot(h[7], 10)
            h[6] = (h[6] + h[8]) & M; h[9] ^= h[6]; h[8] = rot(h[8], 13)
            h[7] = (h[7] + h[9]) & M; h[10] ^= h[7]; h[9] = rot(h[9], 38)
            h[8] = (h[8] + h[10]) & M; h[11] ^= h[8]; h[10] = rot(h[10], 53)
            h[9] = (h[9] + h[11]) & M; h[0] ^= h[9]; h[11] = rot(h[11], 42)
            h[10] = (h[10] + h[0]) & M; h[1] ^= h[10]; h[0] = rot(h[0], 54)

        def hash128_long(data, seed1, seed2):
            h = [seed1, seed2, SC, seed1, seed2, SC,
                 seed1, seed2, SC, seed1, seed2, SC]
            pos = 0
            end = (len(data) // 96) * 96
            while pos < end:
                mix(struct.unpack_from("<12Q", data, pos), h)
                pos += 96
            remainder = len(data) - pos
            buf = bytearray(96)
            buf[:remainder] = data[pos:]
            buf[95] = remainder
            d = struct.unpack("<12Q", bytes(buf))
            for i in range(12):  # End(): add last block, then 3 partials
                h[i] = (h[i] + d[i]) & M
            end_partial(h)
            end_partial(h)
            end_partial(h)
            return h[0], h[1]

        rng_state = 0x9E3779B97F4A7C15
        def next_bytes(n):
            nonlocal rng_state
            out = bytearray()
            while len(out) < n:
                rng_state = (rng_state * 6364136223846793005 + 1442695040888963407) & M
                out += struct.pack("<Q", rng_state)
            return bytes(out[:n])

        for n in (192, 193, 200, 255, 287, 288, 289, 383, 384, 385, 500, 959, 960, 961):
            data = next_bytes(n)
            for s1, s2 in ((0, 0), (1, 2), (0xDEADBEEF, 0xFEEDFACE)):
                assert S.hash128(data, s1, s2) == hash128_long(data, s1, s2), n

    def test_long_path_regression_digests(self):
        """Self-pinned regression vectors over the long domain (no
        external vector is publishable offline — documented in
        functions/spooky.py): any future refactor must reproduce these."""
        from trino_spark.functions import spooky as S

        data = bytes((i * 131 + 17) % 256 for i in range(512))
        assert S.hash64(data[:192]) == S.hash128(data[:192], 0, 0)[0]
        pinned = {
            192: 0xDFDBBE377BC0E66C,
            288: 0x8A4AEFF84E7171A2,
            512: 0x0B2C96BB0E40894B,
        }
        for n, v in pinned.items():
            assert S.hash64(data[:n]) == v, n
