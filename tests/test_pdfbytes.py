"""Byte-stream PDF tokenization: the north rule's span-sequence-equality
invariant proven at the BYTE level — real PDF files (object graph,
FlateDecode streams, xref) round-trip through the from-scratch tokenizer
back to the exact fixture span sequences (kind, text, media_ref, order)."""

import pandas as pd
import pyarrow as pa
import pytest

from b_pdf_parser_ray.fixtures import make_document, make_table_document
from b_pdf_parser_ray.sources.pdfbytes import (
    PdfDocument,
    build_pdf,
    tokenize_pdf_bytes,
    write_pdf_corpus,
)

KEYS = ("kind", "text", "media_ref", "offset")


def _want(doc):
    return [{k: s[k] for k in KEYS} for s in doc["spans"]]


def test_span_roundtrip_all_families():
    """60 seeded fixture docs (every family: standard/heavy/inline/
    indonesian/truncated/no_summary/...) — byte-level round trip must be
    span-for-span exact."""
    for i in range(60):
        doc = make_document(i)
        assert tokenize_pdf_bytes(build_pdf(doc["spans"])) == _want(doc), (
            i,
            doc["family"],
        )


def test_span_roundtrip_table_docs_and_uncompressed():
    for i in range(8):
        doc = make_table_document(i)
        assert tokenize_pdf_bytes(build_pdf(doc["spans"])) == _want(doc)
    doc = make_document(3)
    assert tokenize_pdf_bytes(build_pdf(doc["spans"], compress=False)) == _want(doc)


def test_adversarial_strings_and_multipage():
    spans = [
        {"kind": "text", "text": "paren (nested (deep)) and \\ backslash",
         "media_ref": "", "offset": 0},
        {"kind": "media", "text": "", "media_ref": "Im0", "offset": 1},
        {"kind": "text", "text": "tab\there and )close( mix",
         "media_ref": "", "offset": 2},
        {"kind": "text", "text": "", "media_ref": "", "offset": 3},
    ]
    assert tokenize_pdf_bytes(build_pdf(spans)) == spans

    base = make_document(7)["spans"] * 30  # ~100 pages
    spans = [{**s, "offset": i} for i, s in enumerate(base)]
    assert tokenize_pdf_bytes(build_pdf(spans)) == spans


def test_pdf15_xref_stream_and_objstm_roundtrip():
    """PDF 1.5 structural form: non-stream objects packed in an ObjStm,
    offsets resolved through a PNG-Up-predictor FlateDecode xref STREAM —
    same exact span sequences out."""
    for i in range(30):
        doc = make_document(i)
        data = build_pdf(doc["spans"], pdf15=True)
        assert data.startswith(b"%PDF-1.5")
        assert tokenize_pdf_bytes(data) == _want(doc), (i, doc["family"])
    # structure really is 1.5-shaped: compressed entries present, classic
    # trailer keyword absent
    d = PdfDocument(build_pdf(make_document(0)["spans"], pdf15=True))
    assert d.compressed and b"trailer" not in d.data
    for i in range(5):
        doc = make_table_document(i)
        assert tokenize_pdf_bytes(build_pdf(doc["spans"], pdf15=True)) == _want(doc)


def test_pdf_structure_is_spec_shaped():
    """The writer emits genuinely well-formed PDF: header, xref offsets
    that land on 'N 0 obj', a trailer /Root, FlateDecode content."""
    data = build_pdf(make_document(0)["spans"])
    assert data.startswith(b"%PDF-1.4")
    doc = PdfDocument(data)
    assert doc.trailer["Size"] == max(doc.offsets) + 1
    for num, off in doc.offsets.items():
        assert data[off:].startswith(b"%d 0 obj" % num)
    pages = doc.pages()
    assert pages and all(p["Type"] == ("name", "Page") for p in pages)
    sdict = doc.resolve(pages[0]["Contents"])[1]
    assert sdict["Filter"] == ("name", "FlateDecode")


def test_read_pdf_documents_matches_span_corpus(ray_session, tmp_path):
    """The Ray stage (read_binary_files → tokenize map_batches) reproduces
    the span-table corpus exactly for the same seed."""
    from b_pdf_parser_ray.sources.pdfbytes import read_pdf_documents

    n = 40
    write_pdf_corpus(str(tmp_path / "pdfs"), n)
    rows = {
        r["doc_id"]: r["spans"]
        for r in read_pdf_documents(str(tmp_path / "pdfs")).take_all()
    }
    assert len(rows) == n
    for i in range(n):
        doc = make_document(i)
        got = [{k: s[k] for k in KEYS} for s in rows[doc["doc_id"]]]
        assert got == _want(doc), (i, doc["family"])


def test_extract_pdf_bytes_matches_span_table_path(ray_session):
    """End-to-end: the per-strategy extraction rollup computed from PDF
    BYTES equals the rollup computed from the span-table path over the
    same documents — full-pipeline differential, byte layer included."""
    import ray.data

    from b_pdf_parser_ray.fixtures import corpus_table
    from b_pdf_parser_ray.functions.agg import grouped_agg
    from b_pdf_parser_ray.pipelines.flagship import extract_documents
    from b_pdf_parser_ray.queries import extract_pdf_bytes

    n = 120
    got = extract_pdf_bytes("unused", n_docs=n).to_pandas()

    tbl = corpus_table(n)
    strategies = dict(
        zip(
            (r.as_py() for r in tbl.column("doc_id")),
            (r.as_py() for r in tbl.column("strategy")),
        )
    )
    ext = extract_documents(ray.data.from_arrow(tbl))

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch.column("doc_id").to_pylist()
        return pa.Table.from_arrays(
            [
                pa.array([strategies[i] for i in ids], type=pa.string()),
                pc.cast(batch.column("is_valid"), pa.int64()),
                pc.cast(
                    pc.list_value_length(batch.column("transactions")), pa.int64()
                ),
            ],
            names=["strategy", "valid", "n_txns"],
        )

    want = (
        grouped_agg(
            ext.map_batches(project, batch_format="pyarrow"),
            ["strategy"],
            [
                (None, "count", "n_docs"),
                ("valid", "sum", "n_valid"),
                ("n_txns", "sum", "total_txns"),
            ],
        )
        .sort("strategy")
        .to_pandas()
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )
    # sanity: the corpus actually extracts (not a vacuous all-invalid pass)
    assert want["n_valid"].sum() > 0 and want["total_txns"].sum() > 0


def test_run_resumable_over_pdf_shards(ray_session, tmp_path):
    """The resumable flagship pipeline consumes PDF files directly as
    shards through the read_documents dispatcher: first run processes,
    second run skips every done shard."""
    from b_pdf_parser_ray.pipelines.flagship import run_resumable

    files = write_pdf_corpus(str(tmp_path / "pdfs"), 6)[:4]
    out = str(tmp_path / "out")
    recs = run_resumable(files, out, max_inflight_shards=2)
    assert len(recs) == 4
    assert all(not r["skipped"] for r in recs)
    assert all(r["total"] == 1 for r in recs)  # one document per PDF shard
    again = run_resumable(files, out, max_inflight_shards=2)
    assert all(r["skipped"] for r in again)


def test_two_column_layout_aware_reading_order():
    """Two-column typeset PDFs (newspaper order): the layout-aware
    tokenizer (column detection + per-column y/x sort) recovers the exact
    span sequence, while a naive y-then-x page sort provably interleaves
    the columns — the north star's layout step demonstrated on real
    bytes."""
    from b_pdf_parser_ray.sources.pdfbytes import tokenize_pdf_positions

    for i in range(20):
        doc = make_document(i)
        data = build_pdf(doc["spans"], two_column=True, pdf15=(i % 2 == 1))
        assert tokenize_pdf_bytes(data) == _want(doc), (i, doc["family"])

    doc = make_document(0)
    pos = tokenize_pdf_positions(build_pdf(doc["spans"], two_column=True))
    naive = sorted(pos, key=lambda p: (p[0], -p[2], p[1]))
    naive_texts = [p[4] for p in naive if p[3] == "text"]
    want_texts = [s["text"] for s in doc["spans"] if s["kind"] == "text"]
    assert naive_texts != want_texts  # the naive sort really does fail


def test_embedded_media_assets_decode_pixel_exact():
    """Image XObjects carry real Flate + PNG-predictor pixel data; the
    asset extractor must invert all five scanline filters pixel-exactly,
    in both structural forms."""
    import numpy as np

    from b_pdf_parser_ray.sources.pdfbytes import extract_media_assets, image_pixels

    doc = make_document(4)
    for pdf15 in (False, True):
        assets = extract_media_assets(build_pdf(doc["spans"], pdf15=pdf15))
        refs = {s["media_ref"] for s in doc["spans"] if s["kind"] == "media"}
        assert set(assets) == refs
        for ref, px in assets.items():
            assert np.array_equal(px, image_pixels(ref)), ref


def test_extract_pdf_media_assets_query(ray_session):
    """The ref-keyed decode rollup: every asset consistent across its
    referencing documents (same ref ⇒ same pixels), features match the
    deterministic source pattern, and fanout counts make sense."""
    import numpy as np

    from b_pdf_parser_ray.queries import extract_pdf_media_assets
    from b_pdf_parser_ray.sources.pdfbytes import image_pixels

    df = extract_pdf_media_assets("unused", n_docs=60).to_pandas()
    assert len(df) > 0 and df["consistent"].all()
    assert (df["width"] == 8).all() and (df["height"] == 8).all()
    assert df["n_docs"].max() >= 2  # Im0..Im2 shared by nearly every doc
    for _, row in df.head(5).iterrows():
        px = image_pixels(row["media_ref"])
        assert row["px_mean_e4"] == int(round(float(px.mean()) * 10_000))


def test_extract_pdf_caption_pairs(ray_session):
    """Byte-derived caption pairs must equal the span-fixture captions
    (media_caption_pairs over make_document spans), carry the decoded
    asset's pixel mean, and count caption tokens correctly."""
    import numpy as np
    import pyarrow as pa

    from b_pdf_parser_ray.model import SPAN_TYPE
    from b_pdf_parser_ray.queries import extract_pdf_caption_pairs, media_caption_pairs
    from b_pdf_parser_ray.sources.pdfbytes import image_pixels

    n = 60
    got = extract_pdf_caption_pairs("unused", n_docs=n).to_pandas()
    got = got.sort_values(["doc_id", "media_ref"], ignore_index=True)

    docs = [make_document(i) for i in range(n)]
    spans_tbl = pa.Table.from_arrays(
        [
            pa.array([d["doc_id"] for d in docs]),
            pa.array([d["spans"] for d in docs], type=pa.list_(SPAN_TYPE)),
        ],
        names=["doc_id", "spans"],
    )
    want = media_caption_pairs(spans_tbl).to_pandas()
    want = want.sort_values(["doc_id", "media_ref"], ignore_index=True)
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["media_ref"]) == list(want["media_ref"])
    assert list(got["caption"]) == list(want["caption"])
    for _, row in got.head(10).iterrows():
        assert row["px_mean_e4"] == int(
            round(float(image_pixels(row["media_ref"]).mean()) * 10_000)
        )
        n_tok = 0 if row["caption"] == "" else row["caption"].count(" ") + 1
        assert row["n_caption_tokens"] == n_tok


def test_incremental_update_newest_object_wins():
    """PDF incremental update (appended object + xref section with /Prev):
    the parser must walk the /Prev chain newest-first and resolve the
    REVISED content stream, leaving untouched objects intact."""
    import re
    import zlib

    spans = [
        {"kind": "text", "text": "original line", "media_ref": "", "offset": 0},
        {"kind": "media", "text": "", "media_ref": "Im0", "offset": 1},
        {"kind": "text", "text": "second line", "media_ref": "", "offset": 2},
    ]
    base = build_pdf(spans)
    doc = PdfDocument(base)
    cnum = doc.pages()[0]["Contents"].num
    old_xref = int(re.search(rb"startxref\s+(\d+)", base[-100:]).group(1))

    new_content = (
        b"BT /F1 10 Tf 72 750 Td (REVISED line) Tj ET\n"
        b"q 20 0 0 20 60 735 cm /Im0 Do Q\n"
        b"BT /F1 10 Tf 72 720 Td (second line) Tj ET"
    )
    data = zlib.compress(new_content)
    upd = bytearray(base)
    obj_off = len(upd)
    upd += (
        b"%d 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
        % (cnum, len(data))
        + data
        + b"\nendstream\nendobj\n"
    )
    xref_pos = len(upd)
    upd += b"xref\n0 1\n0000000000 65535 f \n%d 1\n%010d %05d n \n" % (
        cnum, obj_off, 0,
    )
    upd += (
        b"trailer\n<< /Size %d /Root 1 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
        % (cnum + 1, old_xref, xref_pos)
    )
    got = tokenize_pdf_bytes(bytes(upd))
    assert [s["text"] for s in got] == ["REVISED line", "", "second line"]
    assert got[1]["media_ref"] == "Im0"


def test_hypothesis_span_roundtrip_fuzz():
    """Property: ANY span sequence (arbitrary unicode text, arbitrary
    escape-relevant characters, any media interleaving) survives
    build → tokenize exactly, in all four structural/layout combinations."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    text_st = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
    )

    @st.composite
    def span_seqs(draw):
        n = draw(st.integers(min_value=1, max_value=25))
        spans = []
        n_media = 0
        for i in range(n):
            if draw(st.booleans()):
                spans.append({"kind": "media", "text": "",
                              "media_ref": f"Im{n_media}", "offset": i})
                n_media += 1
            else:
                spans.append({"kind": "text", "text": draw(text_st),
                              "media_ref": "", "offset": i})
        return spans

    @given(spans=span_seqs(), pdf15=st.booleans(), two_col=st.booleans())
    @settings(max_examples=60, deadline=None)
    def check(spans, pdf15, two_col):
        data = build_pdf(spans, pdf15=pdf15, two_column=two_col)
        assert tokenize_pdf_bytes(data) == spans

    check()


def test_convert_pdf_corpus_roundtrip(ray_session, tmp_path):
    """PDF dir → span parquet conversion: reading the converted table back
    yields the exact span sequences of the source fixtures (parse the
    bytes once, query the table forever)."""
    from b_pdf_parser_ray.sources.pdfbytes import convert_pdf_corpus
    from b_pdf_parser_ray.sources.tables import read_documents

    n = 30
    write_pdf_corpus(str(tmp_path / "pdfs"), n)
    written = convert_pdf_corpus(str(tmp_path / "pdfs"), str(tmp_path / "tbl"))
    assert written == n
    rows = {r["doc_id"]: r["spans"] for r in read_documents(str(tmp_path / "tbl")).take_all()}
    assert len(rows) == n
    for i in range(n):
        doc = make_document(i)
        got = [{k: s[k] for k in KEYS} for s in rows[doc["doc_id"]]]
        assert got == _want(doc)


def test_double_incremental_update_last_startxref_wins():
    """Two stacked incremental updates whose startxref markers BOTH fall in
    the parser's tail window: the newest (last) startxref must win, and
    object resolution must see the second revision."""
    import re
    import zlib

    spans = [{"kind": "text", "text": "v1", "media_ref": "", "offset": 0}]
    data = build_pdf(spans)
    for rev in ("v2", "v3"):
        doc = PdfDocument(bytes(data))
        cnum = doc.pages()[0]["Contents"].num
        old_xref = int(re.search(rb"startxref\s+(\d+)", data[-2048:][
            data[-2048:].rfind(b"startxref"):]).group(1))
        content = b"BT /F1 10 Tf 72 750 Td (%s) Tj ET" % rev.encode()
        z = zlib.compress(content)
        upd = bytearray(data)
        obj_off = len(upd)
        upd += (b"%d 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
                % (cnum, len(z)) + z + b"\nendstream\nendobj\n")
        xref_pos = len(upd)
        upd += b"xref\n%d 1\n%010d %05d n \n" % (cnum, obj_off, 0)
        upd += (b"trailer\n<< /Size %d /Root 1 0 R /Prev %d >>\n"
                b"startxref\n%d\n%%%%EOF\n" % (cnum + 1, old_xref, xref_pos))
        data = bytes(upd)
    got = tokenize_pdf_bytes(data)
    assert [s["text"] for s in got] == ["v3"]


def test_hex_string_and_comment_content_ops():
    """Content-stream corners the writer never emits but the spec allows:
    hex-string text showing (<...> Tj), hex parts inside TJ arrays, and
    % comments between operators — all through the fast interpreter."""
    from b_pdf_parser_ray.sources.pdfbytes import _interpret_content

    content = (
        b"BT /F1 10 Tf 72 750 Td <48656c6c6f> Tj ET  % a comment\n"
        b"BT /F1 10 Tf 72 735 Td [ <4869> -200 (there) ] TJ ET\n"
        b"q 10 0 0 10 60 700 cm /Im0 Do Q"
    )
    spans = _interpret_content(content)
    assert spans == [
        (750.0, 72.0, "text", "Hello"),
        (735.0, 72.0, "text", "Hithere"),
        (700.0, 60.0, "media", "Im0"),
    ]


def test_corrupt_pdf_shard_contained_and_retried(ray_session, tmp_path):
    """A truncated PDF shard must not kill the run: on_error='record'
    writes a failed manifest and continues; after the file is repaired, a
    re-run retries exactly the failed shard and completes it."""
    from b_pdf_parser_ray.pipelines.flagship import run_resumable

    files = write_pdf_corpus(str(tmp_path / "pdfs"), 3)
    good = open(files[1], "rb").read()
    with open(files[1], "wb") as f:
        f.write(good[: len(good) // 2])  # truncate mid-object
    out = str(tmp_path / "out")
    recs = run_resumable(files, out, on_error="record")
    by_status = {r.get("status", "done" if r.get("total") is not None else "?")
                 for r in recs}
    failed = [r for r in recs if r.get("status") == "failed"]
    done = [r for r in recs if r.get("status") != "failed"]
    assert len(failed) == 1 and len(done) == 2, (by_status, recs)

    with open(files[1], "wb") as f:
        f.write(good)
    again = run_resumable(files, out, on_error="record")
    assert all(r.get("status") != "failed" for r in again)
    retried = [r for r in again if not r["skipped"]]
    assert len(retried) == 1  # only the repaired shard re-ran


def test_lexer_fast_slow_equivalence_fuzz():
    """The regex fast path and the per-char slow path must tokenize any
    serialized object stream identically — property-fuzzed over random
    PDF values (nested dicts/arrays, names, escaped strings, numbers)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from b_pdf_parser_ray.sources.pdfbytes import _Lexer, _esc

    def serialize(v) -> bytes:
        if isinstance(v, bool):
            return b"true" if v else b"false"
        if v is None:
            return b"null"
        if isinstance(v, int):
            return str(v).encode()
        if isinstance(v, float):
            return (b"%.4f" % v)
        if isinstance(v, str):
            if v.startswith("/"):
                return v.encode()
            return b"(" + _esc(v) + b")"
        if isinstance(v, list):
            return b"[ " + b" ".join(serialize(x) for x in v) + b" ]"
        if isinstance(v, dict):
            return (b"<< " + b" ".join(
                b"/%s %s" % (k.encode(), serialize(x)) for k, x in v.items()
            ) + b" >>")
        raise TypeError(v)

    scalar = st.one_of(
        st.integers(-10**9, 10**9),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=20),
        st.booleans(),
        st.none(),
        st.from_regex(r"/[A-Za-z][A-Za-z0-9]{0,8}", fullmatch=True),
    )
    values = st.recursive(
        scalar,
        lambda inner: st.one_of(
            st.lists(inner, max_size=4),
            st.dictionaries(
                st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,8}", fullmatch=True),
                inner, max_size=4,
            ),
        ),
        max_leaves=12,
    )

    def drain(lx, slow):
        toks = []
        while True:
            k, v = (lx._next_token_slow() if slow else lx.next_token())
            if k == "eof":
                return toks
            toks.append((k, v))

    @given(vs=st.lists(values, min_size=1, max_size=5))
    @settings(max_examples=80, deadline=None)
    def check(vs):
        data = b" ".join(serialize(v) for v in vs)
        fast = drain(_Lexer(data), slow=False)
        slow_ = drain(_Lexer(data), slow=True)
        assert fast == slow_

    check()


def test_statement_fast_path_token_path_equivalence_fuzz():
    """The statement-level content interpreter (one regex match per
    ``BT…ET`` / ``q…Q`` line) and the per-token interpreter must emit
    identical span lists — property-fuzzed over streams mixing conforming
    single-statement lines with non-conforming corners (cumulative Td
    runs, general Tm matrices, hex strings, nested parens) that force the
    tiling check to fall back mid-stream."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from b_pdf_parser_ray.sources.pdfbytes import (
        _esc,
        _interpret_content,
        _interpret_content_tokens,
    )

    num = st.integers(-999, 999)
    txt = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=12
    )

    def conforming(x, y, s, shape):
        body = (
            b"(%s) Tj" % _esc(s)
            if shape % 2
            else b"[ (%s) -250 (%s) ] TJ" % (_esc(s[: len(s) // 2]), _esc(s[len(s) // 2:]))
        )
        pos = (
            b"%d %d Td" % (x, y)
            if shape % 3
            else b"1 0 0 1 %d %d Tm" % (x, y)
        )
        return b"BT /F1 10 Tf %s %s ET" % (pos, body)

    def nonconforming(x, y, s, shape):
        k = shape % 4
        if k == 0:  # cumulative Td run inside one BT block
            return (b"BT /F1 10 Tf %d %d Td (%s) Tj 0 -14 Td (%s) Tj ET"
                    % (x, y, _esc(s), _esc(s)))
        if k == 1:  # general text matrix
            return b"BT /F1 10 Tf 2 0 0 2 %d %d Tm (%s) Tj ET" % (x, y, _esc(s))
        if k == 2:  # hex string
            return b"BT /F1 10 Tf %d %d Td <48656c6c6f> Tj ET" % (x, y)
        return b"BT /F1 10 Tf %d %d Td (a(b)c) Tj ET" % (x, y)  # nested parens

    line = st.tuples(num, num, txt, st.integers(0, 11), st.booleans()).map(
        lambda t: conforming(*t[:4]) if t[4] else nonconforming(*t[:4])
    )
    img = st.tuples(num, num).map(
        lambda t: b"q 20 0 0 20 %d %d cm /Im0 Do Q" % t
    )

    @given(lines=st.lists(st.one_of(line, img), min_size=0, max_size=8))
    @settings(max_examples=120, deadline=None)
    def check(lines):
        content = b"\n".join(lines)
        assert _interpret_content(content) == _interpret_content_tokens(content)

    check()


def test_extract_multi_source_equals_single_source(ray_session):
    """The heterogeneous-source union (parquet + JSONL + PDF slices of the
    same fixture corpus through the read_documents dispatcher) must
    produce the same per-document extraction totals as the single
    span-table path over the identical 100 documents."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from b_pdf_parser_ray.fixtures import corpus_table
    from b_pdf_parser_ray.pipelines.flagship import extract_documents
    from b_pdf_parser_ray.queries import extract_multi_source

    got = extract_multi_source("unused").to_pandas()
    assert list(got["n_docs"]) == [30, 40, 30]  # jsonl, parquet, pdf (sorted)

    ext = extract_documents(
        ray.data.from_arrow(corpus_table(100).select(["doc_id", "spans"]))
    )
    valid = 0
    txns = 0
    for b in ext.iter_batches(batch_format="pyarrow"):
        valid += pc.sum(pc.cast(b.column("is_valid"), pa.int64())).as_py() or 0
        txns += pc.sum(pc.list_value_length(b.column("transactions"))).as_py() or 0
    assert int(got["n_valid"].sum()) == valid
    assert int(got["total_txns"].sum()) == txns


def test_extract_pdf_bytes_sidecar_forced_hash_plan(ray_session, monkeypatch):
    """Round-4 verdict task 6: the strategy sidecar is a real table through
    the size-gated lookup join.  Forced gate (cap=0) must run BOTH attach
    points (pre-extract and rollup re-attach) over the hash-partitioned
    ``Dataset.join`` plan and leave the per-strategy rollup unchanged."""
    from b_pdf_parser_ray.functions import joins
    from b_pdf_parser_ray.queries import extract_pdf_bytes

    n = 120
    want = extract_pdf_bytes("unused", n_docs=n).to_pandas()
    monkeypatch.setattr(joins, "BROADCAST_MAX_SOURCE_ROWS", 0)
    got = extract_pdf_bytes("unused", n_docs=n).to_pandas()
    w = want.sort_values("strategy", ignore_index=True)
    g = got.sort_values("strategy", ignore_index=True)
    assert g.equals(w), f"hash-plan rollup diverged:\n{g}\nvs\n{w}"
