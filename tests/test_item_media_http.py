"""Item/Field parity (pomp contrib.item), media plumbing stubs, and
HttpFetcher (mapInPandas transport) with an injected fake transport."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from pompspark.item import Field, Item


class PageItem(Item):
    url = Field(str)
    n_links = Field(int)
    score = Field(float)


def test_item_schema_order_and_rows(spark):
    s = PageItem.schema()
    assert [f.name for f in s.fields] == ["url", "n_links", "score"]
    assert s["n_links"].dataType.typeName() == "long"
    it = PageItem(url="http://a/", n_links=3, score=0.5)
    assert it.row() == ("http://a/", 3, 0.5)
    df = PageItem.to_df(spark, [it, PageItem(url="http://b/", n_links=0, score=None)])
    assert df.count() == 2
    with pytest.raises(TypeError):
        PageItem(bogus=1)


class Child(PageItem):
    extra = Field(bytes)


def test_item_inheritance():
    assert list(Child._fields) == ["url", "n_links", "score", "extra"]
    assert Child.schema()["extra"].dataType.typeName() == "binary"


# --------------------------------------------------------------- media

def test_decode_images_fake(spark):
    from pompspark.media import decode_images, fake_image_decoder

    df = spark.createDataFrame(
        pd.DataFrame({
            "media_id": [1, 2, 3],
            "payload": [b"\x10abcdef\x20", b"\x30xyz\x01", None],
        })
    )
    out = decode_images(df, decoder=fake_image_decoder).collect()
    rows = {r.media_id: r for r in out}
    assert rows[1].width == 16 + 0x10 % 48 and rows[1].decode_error is None
    assert len(rows[1].features) == 64
    assert rows[3].decode_error is not None  # error isolated, task alive
    assert rows[3].features is None


def test_decode_images_default_stub_raises_cleanly(spark):
    from pompspark.media import decode_images

    df = spark.createDataFrame(pd.DataFrame({"payload": [b"xx"]}))
    out = decode_images(df).collect()  # default decoder -> error column
    assert "NotImplementedError" in out[0].decode_error or "codec" in out[0].decode_error


def test_sample_frames(spark):
    from pompspark.media import sample_frames

    df = spark.createDataFrame(pd.DataFrame({
        "vid": [1], "payload": [bytes([25]) + b"videodata"],
    }))
    out = sample_frames(df, every_n=10).collect()
    assert [r.frame_idx for r in out] == [0, 10, 20]
    assert all(r.frame == bytes([25]) + b"videoda" for r in out)


# --------------------------------------------------------------- http fetcher

def test_http_fetcher_with_fake_transport(spark, tmp_path):
    """Prove the real-cluster fetch path end-to-end: engine + HttpFetcher
    with an injected deterministic transport (no network)."""
    from pompspark.engine import CrawlEngine
    from pompspark.fetch import HttpFetcher
    from pompspark.fixtures import SMALL_SITEMAP, page_html

    def transport(urls: pd.Series) -> pd.DataFrame:
        status, ts, html = [], [], []
        for u in urls:
            kids = SMALL_SITEMAP.get(u)
            if kids is None:
                status.append(404); ts.append(pd.NaT); html.append(None)
            else:
                status.append(200)
                ts.append(dt.datetime(2026, 1, 1))
                html.append(page_html(u, f"body of {u}", kids))
        return pd.DataFrame({"status": status, "warc_ts": ts, "html": html},
                            index=urls.index)

    eng = CrawlEngine(
        spark, str(tmp_path / "s"), HttpFetcher(transport),
        ordering="bfs", per_round_budget=5, per_host_budget=5,
    )
    eng.seed(["http://a.example/p0"])
    eng.run(max_rounds=50)
    urls = {r.url for r in eng.trace().collect()}
    assert urls == set(SMALL_SITEMAP)
    log = {r.url: r for r in eng.fetch_log().collect()}
    assert all(log[u].status == 200 for u in SMALL_SITEMAP)


def test_http_fetcher_transport_failure_isolated(spark, tmp_path):
    from pompspark.engine import CrawlEngine
    from pompspark.fetch import HttpFetcher

    def bad_transport(urls: pd.Series) -> pd.DataFrame:
        raise ConnectionError("network down")

    eng = CrawlEngine(
        spark, str(tmp_path / "s"), HttpFetcher(bad_transport),
        ordering="bfs", per_round_budget=5, per_host_budget=5,
    )
    eng.seed(["http://a.example/p0"])
    eng.run(max_rounds=3)
    log = eng.fetch_log().collect()
    assert len(log) == 1
    assert log[0].status == 599 and "network down" in log[0].error


def test_http_fetcher_politeness_slots(spark, tmp_path):
    """HttpFetcher paces by the politeness schedule: with a slot_s
    column, the Arrow batch is issued to transport in PER-SLOT
    sub-batches, each slept to its due time — a batch-wide sleep would
    hit one host with every same-host row of the batch at one instant
    (r2 advice). Injected sleeper + transport-call accumulators record
    the pacing."""
    import pandas as pd
    from pyspark.sql import functions as F

    from pompspark.fetch import HttpFetcher
    from pompspark.politeness import schedule_slots

    batch = spark.createDataFrame(
        [(f"http://h{i % 2}.example/p{i}", f"h{i % 2}.example", i + 1, 2.0)
         for i in range(6)],
        "url string, host string, fetch_rank long, crawl_delay double",
    )
    scheduled = schedule_slots(batch).coalesce(1)

    acc = spark.sparkContext.accumulator(0.0)
    n_calls = spark.sparkContext.accumulator(0)
    max_call = spark.sparkContext.accumulator(0)

    def fake_transport(urls: pd.Series) -> pd.DataFrame:
        n_calls.add(1)
        max_call.add(len(urls))  # sums; with equal-size calls: n*size
        return pd.DataFrame({
            "status": [200] * len(urls),
            "warc_ts": [pd.Timestamp("2026-01-01")] * len(urls),
            "html": [b"<html><body>x</body></html>"] * len(urls),
            "error": [None] * len(urls),
        }, index=urls.index)

    f = HttpFetcher(transport=fake_transport, sleeper=acc.add)
    out = f.fetch(scheduled)
    assert out.count() == 6
    # schedule: per host slots 0,2,4 -> sleeps 2 + 2 between slots
    assert abs(acc.value - 4.0) <= 1e-9
    # per-slot sub-batches: 3 transport calls of 2 urls (one per host)
    assert n_calls.value == 3
    assert max_call.value == 6


def test_ppm_bmp_real_decode(spark):
    """ppm_bmp_decoder is a REAL decoder (numpy-only): P6 PPM and
    24-bit BMP payloads decode to correct dimensions and a 64-dim
    pooled feature through the full decode_images plumbing."""
    import struct

    import numpy as np

    from pompspark.media import decode_images, ppm_bmp_decoder

    w, h = 20, 12
    rgb = np.zeros((h, w, 3), dtype=np.uint8)
    rgb[..., 0] = np.arange(w, dtype=np.uint8)[None, :] * 10  # red ramp
    ppm = b"P6\n# comment\n%d %d\n255\n" % (w, h) + rgb.tobytes()

    d = ppm_bmp_decoder(ppm)
    assert (d["width"], d["height"]) == (w, h)
    assert d["pixels"].shape == (h, w)
    # luma of a pure-red ramp: 0.299 * red
    assert abs(int(d["pixels"][0, 10]) - int(0.299 * 100)) <= 1

    # 24-bit BMP (bottom-up, BGR, 4-byte row padding)
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for y in range(h - 1, -1, -1):
        row = bytearray()
        for x in range(w):
            r, g, b = rgb[y, x]
            row += bytes([b, g, r])
        row += b"\x00" * (stride - len(row))
        raster += row
    bmp = (b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster),
                         2835, 2835, 0, 0) + bytes(raster))
    d2 = ppm_bmp_decoder(bmp)
    assert (d2["width"], d2["height"]) == (w, h)
    assert np.array_equal(d2["pixels"], d["pixels"])  # same image

    rows = [(1, ppm), (2, bmp), (3, b"\x89PNG....")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = decode_images(df, decoder=ppm_bmp_decoder).collect()
    by_id = {r.media_id: r for r in out}
    assert by_id[1].width == w and by_id[1].decode_error is None
    assert len(by_id[1].features) == 64
    assert by_id[2].height == h and by_id[2].decode_error is None
    assert by_id[3].decode_error is not None  # png needs injected codec


# --------------------------------------------------------------- audio

def _wav_bytes(samples, rate=8000, bits=16, n_ch=1, fmt=1):
    """Test-side RIFF/WAVE writer (struct only — independent of the
    decoder under test)."""
    import struct

    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    if fmt == 1 and bits == 16:
        raw = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    elif fmt == 1 and bits == 8:
        raw = (np.clip(x, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
    elif fmt == 3 and bits == 32:
        raw = x.astype("<f4").tobytes()
    else:
        raise ValueError
    block = n_ch * bits // 8
    fmt_chunk = struct.pack("<HHIIHH", fmt, n_ch, rate, rate * block, block, bits)
    body = (b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
            + b"data" + struct.pack("<I", len(raw)) + raw)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_wav_pcm_decoder_roundtrip():
    import numpy as np

    from pompspark.media import wav_pcm_decoder

    t = np.arange(4000) / 8000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    d = wav_pcm_decoder(_wav_bytes(sig, bits=16))
    assert d["sample_rate"] == 8000 and len(d["samples"]) == 4000
    assert np.abs(d["samples"] - sig).max() < 1e-3        # 16-bit quantization
    # float32 is exact; stereo averages to mono
    d32 = wav_pcm_decoder(_wav_bytes(sig, bits=32, fmt=3))
    assert np.abs(d32["samples"] - sig.astype(np.float32)).max() < 1e-7
    stereo = np.empty(8000); stereo[0::2] = sig; stereo[1::2] = -sig
    dst = wav_pcm_decoder(_wav_bytes(stereo, n_ch=2, bits=16))
    assert len(dst["samples"]) == 4000
    assert np.abs(dst["samples"]).max() < 1e-3            # L/R cancel
    d8 = wav_pcm_decoder(_wav_bytes(sig, bits=8))
    assert np.abs(d8["samples"] - sig).max() < 2 / 127
    with pytest.raises(ValueError):
        wav_pcm_decoder(b"ID3\x04mp3-payload")            # inject-a-codec seam


def test_decode_audio_spark(spark):
    import numpy as np

    from pompspark.media import decode_audio, wav_pcm_decoder

    t = np.arange(16000) / 16000.0
    loud = _wav_bytes(0.8 * np.sin(2 * np.pi * 220 * t), rate=16000)
    quiet = _wav_bytes(0.01 * np.sin(2 * np.pi * 220 * t), rate=16000)
    df = spark.createDataFrame(
        pd.DataFrame({
            "media_id": [1, 2, 3],
            "payload": [loud, quiet, b"\xffgarbage"],
        })
    )
    rows = {r.media_id: r
            for r in decode_audio(df, decoder=wav_pcm_decoder).collect()}
    assert rows[1].media_type == "audio" and rows[1].mime == "audio/wav"
    assert rows[1].n_frames == 16000 and rows[1].sample_rate == 16000
    assert abs(rows[1].duration_s - 1.0) < 1e-9
    assert len(rows[1].features) == 64
    # RMS envelope of a 0.8 sine ~ 0.8/sqrt(2); quiet is 80x smaller
    assert abs(rows[1].features[5] - 0.8 / np.sqrt(2)) < 0.05
    assert rows[2].features[5] < 0.02
    assert rows[3].decode_error is not None and rows[3].features is None


def test_decode_audio_default_stub_raises_cleanly(spark):
    from pompspark.media import decode_audio

    df = spark.createDataFrame(pd.DataFrame({"payload": [b"\x00"]}))
    out = decode_audio(df).collect()
    assert "inject" in out[0].decode_error


def test_engine_paces_http_fetcher_by_crawl_delay(spark, tmp_path):
    """run_round attaches the politeness schedule for a paced fetcher
    (r3 verdict: pacing worked at the fetcher level but the engine
    never wired slot_s). One host with Crawl-delay: 2 and 3 urls in the
    round => slots 0,2,4 within its applyInPandas group, so the
    recorded executor sleeps total (3-1)*2 s; the no-delay host adds
    none."""
    from pompspark.engine import CrawlEngine
    from pompspark.fetch import HttpFetcher
    from pompspark.robots import build_robots_cache

    def transport(urls: pd.Series) -> pd.DataFrame:
        return pd.DataFrame({
            "status": [200] * len(urls),
            "warc_ts": [pd.Timestamp("2026-01-01")] * len(urls),
            "html": [b"<html><body>leaf</body></html>"] * len(urls),
            "error": [None] * len(urls),
        }, index=urls.index)

    hosts = spark.createDataFrame(
        [("slow.example", "User-agent: *\nCrawl-delay: 2\n", None),
         ("fast.example", "User-agent: *\n", None)],
        "host string, robots_txt string, fetched_ts timestamp",
    )
    slept = spark.sparkContext.accumulator(0.0)
    eng = CrawlEngine(
        spark, str(tmp_path / "s"),
        HttpFetcher(transport, sleeper=slept.add),
        robots_df=build_robots_cache(hosts),
        ordering="bfs", per_round_budget=10, per_host_budget=5,
        round_seconds=10.0,  # cap for slow.example = floor(10/2) = 5 >= 3
    )
    eng.seed([f"http://slow.example/p{i}" for i in range(3)]
             + [f"http://fast.example/q{i}" for i in range(3)])
    n = eng.run_round()
    assert n == 6
    log = {r.url: r.status for r in eng.fetch_log().collect()}
    assert len(log) == 6 and set(log.values()) == {200}
    # slow.example slots: 0, 2, 4 (rank order) -> sleeps 2 + 2
    assert abs(slept.value - 4.0) < 1e-9
