import numpy as np
import pandas as pd
import pytest

from etl_ray.functions import text as T
from etl_ray.functions.keys import (
    base64hash,
    bucket_of_md5,
    hop_id,
    md5_hex,
    synthetic_uuid,
)
from etl_ray.functions.netutil import (
    get_iata_code,
    ip_to_int,
    is_valid_ip,
    normalize_ip,
    number_bits_different,
)
from etl_ray.functions.paths import (
    create_test_id,
    extract_logtime,
    parse_archive_path,
)


def test_keys_deterministic():
    assert md5_hex("abc") == "900150983cd24fb0d6963f7d28e17f72"
    assert base64hash("abc") == base64hash("abc")
    assert synthetic_uuid("u1", 5) == md5_hex("u1|5")
    assert hop_id(0, "host", "1.2.3.4") == "19700101_host_1.2.3.4"
    b = bucket_of_md5(["a", "b", "a"], 8)
    assert b[0] == b[2] and 0 <= b.min() and b.max() < 8


def test_normalize_ip():
    assert normalize_ip("::ffff:1.2.3.4") == "1.2.3.4"
    assert normalize_ip("2001:DB8::1") == "2001:db8::1"
    assert normalize_ip("2001:db8:::1") == "2001:db8::1"  # ::: repair
    assert normalize_ip("not-an-ip") == "not-an-ip"
    assert is_valid_ip("10.0.0.1") and not is_valid_ip("999.1.1.1")


def test_ip_ints():
    assert ip_to_int("0.0.0.4") == 4
    assert number_bits_different("10.0.0.0", "10.0.0.3") == 2


def test_iata():
    assert get_iata_code("mlab1-lga05.mlab-oti.measurement-lab.org") == "lga"
    assert get_iata_code("nohost", "xxx") == "xxx"


def test_archive_path():
    p = parse_archive_path(
        "gs://archive-bucket/ndt/ndt7/2024/01/31/20240131T000000Z-host.tgz")
    assert p and p.experiment == "ndt" and p.datatype == "ndt7"
    assert p.date == "2024-01-31"
    assert parse_archive_path("gs://b/bad") is None
    assert create_test_id("2024-01-31", "h.s", "f.json") == \
        "2024/01/31/h.s/f.json.gz"


def test_logtime():
    dt = extract_logtime("20170509T13:45:13.590210000Z_eb.net:44160")
    assert dt is not None and (dt.year, dt.minute) == (2017, 45)
    assert extract_logtime("nodate") is None


def test_text_kernels():
    s = pd.Series(["the cat and the dog", "", None, "a b  c"])
    assert list(T.word_count(s)) == [5, 0, 0, 3]
    assert T.stopword_count(s)[0] == 3  # the, and, the
    q = T.quality_metrics(s)
    assert q["n_words"].tolist() == [5, 0, 0, 3]
    assert q["stop_ratio"][0] == 3 / 5

    langs = T.detect_lang(pd.Series(
        ["the cat is on the mat", "der hund ist nicht da", "zzz qqq"]))
    assert list(langs) == ["en", "de", "unk"]

    fp = T.fingerprint_md5(pd.Series(["A  b", "a b"]))
    assert fp[0] == fp[1]  # normalization collapses case+whitespace

    h = T.rolling_hashes("abcdefgh", window=4)
    assert len(h) == 5
    # rolling property: recompute directly
    direct = T.rolling_hashes("bcde", window=4)
    assert h[1] == direct[0]
    w = T.winnow_fingerprint("abcdefghijklmno", window=4, k=4)
    assert len(w) == 3


def test_bpe_count():
    s = pd.Series(["hello, world 42!", ""])
    # hello | , | world | 42 | !
    assert list(T.bpe_token_count(s)) == [5, 0]
