"""HTML boilerplate-strip stage + multimodal media stage tests."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from b_pdf_parser_ray.functions.html import (
    classify_blocks,
    segment_blocks,
    strip_boilerplate,
)
from b_pdf_parser_ray.stages.boilerplate import (
    BoilerplateStripper,
    recovered_body,
    synth_page,
)
from b_pdf_parser_ray.stages.media import (
    AudioFeatures,
    ImageFeatures,
    ImageResizer,
    VideoFrameSampler,
    _decode_fake,
    _decode_gif,
    _decode_png,
    encode_gif,
    encode_png,
    fake_image,
    synth_gif,
    synth_media_table,
    synth_png,
)

BODY = (
    "The quick brown fox jumps over the lazy dog near the riverbank every "
    "single morning while the farmer watches from the wooden porch with a "
    "cup of strong black coffee and a folded newspaper under one arm "
) * 3


# ---------------------------------------------------------------------------
# Pure HTML heuristics
# ---------------------------------------------------------------------------


def test_segment_blocks_skips_script_and_style():
    blocks = segment_blocks("<script>var x=1;</script><p>hello world text</p><style>a{}</style>")
    texts = [b["text"] for b in blocks if b["kind"] == "text"]
    assert texts == ["hello world text"]


def test_link_density_marks_nav_as_boilerplate():
    html = (
        '<div><a href="/a">one two three four five six seven eight nine ten eleven</a></div>'
        "<p>" + BODY + "</p>"
    )
    blocks = segment_blocks(html)
    keep = classify_blocks(blocks)
    kept_texts = [b["text"] for b, k in zip(blocks, keep) if k and b["kind"] == "text"]
    assert len(kept_texts) == 1 and kept_texts[0].startswith("The quick brown fox")


def test_heading_adopts_following_content():
    html = "<h1>Short title</h1><p>" + BODY + "</p>"
    blocks = segment_blocks(html)
    keep = classify_blocks(blocks)
    assert keep[0] is True  # heading kept because next block is content


def test_media_adjacent_to_content_is_kept_nav_icon_dropped():
    html = (
        '<nav><img src="logo.png"/><a href="/">home</a></nav>'
        "<p>" + BODY + '</p><img src="figure.png"/>'
    )
    res = strip_boilerplate(html)
    media = [s["media_ref"] for s in res["spans"] if s["kind"] == "media"]
    assert media == ["figure.png"]


def test_strip_boilerplate_offsets_are_strictly_increasing():
    res = strip_boilerplate(synth_page("d1", BODY))
    offs = [s["offset"] for s in res["spans"]]
    assert offs == sorted(offs) and len(set(offs)) == len(offs)


def test_synth_page_round_trip_exact():
    page = synth_page("doc42", BODY)
    res = strip_boilerplate(page)
    assert recovered_body(res["main_text"], "doc42") == " ".join(BODY.split())
    # the article figure survives; the ad banner in <aside> does not
    media = [s["media_ref"] for s in res["spans"] if s["kind"] == "media"]
    assert media == ["figure_doc42.png"]


# ---------------------------------------------------------------------------
# Ray stage: BoilerplateStripper
# ---------------------------------------------------------------------------


def test_boilerplate_stripper_stage(ray_session):
    rows = [{"doc_id": f"d{i}", "html": synth_page(f"d{i}", BODY)} for i in range(20)]
    ds = ray.data.from_items(rows)
    out = ds.map_batches(
        BoilerplateStripper, batch_format="pyarrow", batch_size=8, concurrency=2
    ).to_pandas()
    assert len(out) == 20
    assert (out["n_content_blocks"] > 0).all()
    for _, row in out.iterrows():
        main = "\n".join(
            s["text"] for s in row["spans"] if s["kind"] == "text"
        )
        assert recovered_body(main, row["doc_id"]) == " ".join(BODY.split())
        assert row["n_media"] == 1


# ---------------------------------------------------------------------------
# Media stages
# ---------------------------------------------------------------------------


def test_fake_payload_roundtrip_deterministic():
    p1, p2 = fake_image("m1", 16, 8), fake_image("m1", 16, 8)
    assert p1 == p2
    img = _decode_fake(p1)
    assert img.shape == (8, 16, 3)


def test_real_decode_raises_not_implemented():
    with pytest.raises((NotImplementedError, ValueError)):
        _decode_fake(b"\x89PNG\r\n\x1a\nrealbytes")


def test_image_features_stage(ray_session):
    tbl = synth_media_table(30)
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(ImageFeatures, batch_format="pyarrow", batch_size=16, concurrency=2)
        .to_pandas()
    )
    assert len(out) == 10  # every 3rd row is an image
    assert (out["width"] > 0).all() and out["phash64"].nunique() > 1
    # determinism: rerun gives identical features
    out2 = (
        ray.data.from_arrow(tbl)
        .map_batches(ImageFeatures, batch_format="pyarrow", batch_size=16, concurrency=2)
        .to_pandas()
    )
    assert out.sort_values("media_id").reset_index(drop=True).equals(
        out2.sort_values("media_id").reset_index(drop=True)
    )


def test_image_resizer_stage(ray_session):
    tbl = synth_media_table(12)
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(ImageResizer, batch_format="pyarrow", batch_size=8, concurrency=2)
        .to_pandas()
    )
    assert len(out) == 4
    for payload in out["payload"]:
        # inputs are real PNGs, so resized output stays in the container format
        img = _decode_png(payload)
        assert img.shape == (32, 32, 3)


def test_audio_features_stage(ray_session):
    out = (
        ray.data.from_arrow(synth_media_table(30))
        .map_batches(AudioFeatures, batch_format="pyarrow", batch_size=16, concurrency=2)
        .to_pandas()
    )
    assert len(out) == 10
    assert (out["duration_sec"] > 0).all() and (out["mean_rms"] > 0).all()


def test_video_frame_sampler_fan_out(ray_session):
    tbl = synth_media_table(30)
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(VideoFrameSampler, batch_format="pyarrow", batch_size=16, concurrency=2)
        .to_pandas()
    )
    # videos have 10/20/30/40 frames, stride 10 → 1/2/3/4 sampled frames
    assert len(out) > 10
    assert (out["frame_idx"] % 10 == 0).all()
    for payload in out["payload"].head(3):
        # sampled frames from real GIF inputs come out as real PNGs
        assert _decode_png(payload).ndim == 3


def test_wav_payloads_are_real_and_decode_matches_ground_truth(ray_session):
    """The audio path is a REAL codec now: synth_wav emits genuine RIFF/WAV
    bytes the stdlib wave module (an independent decoder here) round-trips,
    and AudioFeatures' outputs equal features computed directly from the
    known PCM."""
    import io
    import wave as wave_mod

    import numpy as np

    from b_pdf_parser_ray.stages.media import AudioFeatures, _decode_wav, synth_wav

    payload = synth_wav("clip_1", sample_rate=16000, n_samples=12000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"

    # independent stdlib round-trip
    with wave_mod.open(io.BytesIO(payload), "rb") as w:
        assert w.getframerate() == 16000
        assert w.getnframes() == 12000
        raw = np.frombuffer(w.readframes(12000), dtype="<i2")
    sr, got = _decode_wav(payload)
    assert sr == 16000 and np.array_equal(got, raw)

    # stage features == ground truth computed from the same PCM
    batch = pa.Table.from_pylist(
        [{"media_id": "clip_1", "kind": "audio", "payload": payload}]
    )
    out = AudioFeatures(window=2048)(batch).to_pylist()[0]
    x = raw.astype(np.float64) / 32768.0
    frames = x[: (len(x) // 2048) * 2048].reshape(-1, 2048)
    assert out["duration_sec"] == len(x) / 16000
    assert out["mean_rms"] == float(np.sqrt((frames**2).mean(axis=1)).mean())
    assert out["zcr"] == float((np.diff(np.signbit(x)) != 0).mean())
    # a real tone has substantial energy and a plausible zero-crossing rate
    assert 0.2 < out["mean_rms"] < 0.5 and 0 < out["zcr"] < 0.5

    # fake=False rejects only the stub format, not real WAV
    from b_pdf_parser_ray.stages.media import fake_audio

    strict = AudioFeatures(fake=False)
    assert strict(batch).num_rows == 1
    stub = pa.Table.from_pylist(
        [{"media_id": "s", "kind": "audio", "payload": fake_audio("s")}]
    )
    with pytest.raises(NotImplementedError):
        strict(stub)


# ---------------------------------------------------------------------------
# Real PNG / GIF codecs
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_roundtrip_bit_identical(channels):
    """encode_png cycles scanline filters 0-4 by row, so a ≥5-row image
    exercises every unfilter path; decode must recover the exact pixels."""
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(11, 17, channels), dtype=np.uint8)
    payload = encode_png(arr)
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    got = _decode_png(payload)
    assert got.shape == (11, 17, channels)
    assert np.array_equal(got, arr)


def test_synth_png_is_deterministic_real_container():
    p1, p2 = synth_png("m1", 40, 24), synth_png("m1", 40, 24)
    assert p1 == p2
    img = _decode_png(p1)
    assert img.shape == (24, 40, 3)


def test_gif_roundtrip_bit_identical():
    """Gray palette + integer 601 luminance weights make the multi-frame
    GIF round-trip exact, LZW decompression included."""
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(5, 13, 19), dtype=np.uint8)
    payload = encode_gif(frames)
    assert payload[:6] == b"GIF89a"
    got = _decode_gif(payload)
    assert np.array_equal(got, frames)
    assert _decode_gif(synth_gif("v1", 16, 12, 7)).shape == (7, 12, 16)


def test_gif_lzw_decode_handles_compressing_streams():
    """Our encoder emits literal codes only; a conformant *compressing*
    encoder also emits table codes, including the KwKwK pattern where a
    code references the entry being defined.  Hand-pack such a stream
    (min_code_size=2: clear=4, eoi=5) and check the decoder handles it."""
    from b_pdf_parser_ray.stages.media import _gif_lzw_decode

    def pack(codes, width):
        acc = n = 0
        out = bytearray()
        for c in codes:
            acc |= c << n
            n += width
            while n >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                n -= 8
        if n:
            out.append(acc & 0xFF)
        return bytes(out)

    # clear, literal 1, code 6 (== table size at that moment → KwKwK), eoi
    stream = pack([4, 1, 6, 5], width=3)
    got = _gif_lzw_decode(stream, min_code_size=2)
    assert got.tolist() == [1, 1, 1]
