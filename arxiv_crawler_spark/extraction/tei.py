"""TEI citation extraction — the per-row invariant of the engine.

Re-states the reference extractor's semantics
(``CitationExtractor.process_paper``, /root/reference/arxiv_crawler/src/
arxiv_crawler/arxiv_util.py:187-271, plus helpers :107-185) on stdlib
``xml.etree.ElementTree`` (lxml is not available in this environment).
Recover-mode parity (arxiv_util.py:206 ``XMLParser(recover=True)``) comes
from :func:`recover_xml` — a tolerant tokenizer that repairs malformed
documents the way libxml2-recover does (implicit closes, stray-tag drops,
EOF closes) so recoverable Grobid output extracts instead of becoming a
failed pop; only true garbage stays on the failure path
(crawler.py:181-186).

Semantics preserved exactly (each tested):
* bibliography walk in document order over ``//listBibl/biblStruct``
  (arxiv_util.py:214); entries without an ``xml:id`` skipped (:215-217)
* authors = forename(s) then surname(s) joined by single spaces (:221-230)
* title: first ``title[@level="a"]``, else first ``title`` (:233-235)
* year from ``date[@type="published"]/@when`` (:237); venue from
  ``monogr/title`` (:238)
* the four arXiv-id strategies in order: explicit ``idno[@type="arXiv"]``,
  any-``idno`` abs//URL forms, ``ptr/@target`` URLs, venue CoRR /
  "arXiv preprint" full-text (:132-185)
* in-text references: ``ref[@type="bibr"]`` → ancestor ``<s>`` sentence,
  else paragraph ". "-split fallback (:111-130, :260-265); de-duplicated as
  a set (:257, :265)
* text of an element = all descendant text nodes joined by " " then
  stripped (:107-109) — ``ElementTree.itertext()`` yields exactly the
  nodes lxml's ``.//text()`` does, in the same order

One deliberate divergence, required for a *byte-stable* invariant: the
reference materializes the per-citation sentence set via ``list(set)``
(arxiv_util.py:267-269), whose order depends on the per-process string hash
seed. We sort ``reference_contexts`` lexicographically. The reference's own
golden test compares that field order-insensitively
(tests/test_citation_extractor.py:149-158), so sorted order is within spec
while making the canonical JSON reproducible across runs.

The engine path is ``extract_pages`` — a ``mapInArrow`` transform: Arrow
batches of ``(url, html)`` in, one Python XML parse per *document* (the
granularity the reference also pays), no per-row Python UDF calls, and the
nested output assembled batch-at-a-time by pyarrow's C++ converter.
"""

from __future__ import annotations

import functools
import gzip
import json
import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

TEI_NS = "http://www.tei-c.org/ns/1.0"
XML_ID = "{http://www.w3.org/XML/1998/namespace}id"


@functools.lru_cache(maxsize=64)
def _t(tag: str) -> str:
    # called ~700×/doc in the hot batch UDF — the cache turns an f-string
    # build into a dict hit
    return f"{{{TEI_NS}}}{tag}"


# regexes re-stated from arxiv_util.py:147,154,159,181
_RE_EXPLICIT = re.compile(r"arXiv:?\s*(\d{4}\.\d{4,5})", re.IGNORECASE)
_RE_ABS = re.compile(r"abs/(\d{4}\.\d{4,5})")
_RE_URL = re.compile(r"arxiv\.org/(?:abs|pdf)/(\d{4}\.\d{4,5})", re.IGNORECASE)
_RE_PREPRINT = re.compile(r"arXiv\s+preprint\s+arXiv:?(\d{4}\.\d{4,5})", re.IGNORECASE)


def _get_text(elem: ET.Element) -> str:
    """arxiv_util.py:107-109 — join of all descendant text nodes, stripped."""
    return " ".join(elem.itertext()).strip()


def _sentence_context(ref: ET.Element, parents: dict[ET.Element, ET.Element]) -> str | None:
    """arxiv_util.py:111-130 — ancestor <s>, else <p> with '. ' split."""
    anc = parents.get(ref)
    sentence = None
    paragraph = None
    while anc is not None:
        if sentence is None and anc.tag == _t("s"):
            sentence = anc
        if paragraph is None and anc.tag == _t("p"):
            paragraph = anc
        anc = parents.get(anc)
    if sentence is not None:
        return _get_text(sentence)
    if paragraph is not None:
        para_text = _get_text(paragraph)
        ref_text = _get_text(ref)
        for sent in para_text.split(". "):
            if ref_text in sent:
                return sent.strip()
    return None


def _extract_arxiv_id(bib: ET.Element, venue_list: list[str]) -> str | None:
    """The four-strategy cascade of arxiv_util.py:132-185, same order."""
    return _arxiv_id_from_parts(
        bib, list(bib.iter(_t("idno"))), list(bib.iter(_t("ptr"))), venue_list
    )


def _arxiv_id_from_parts(
    bib: ET.Element,
    idnos: list[ET.Element],
    ptrs: list[ET.Element],
    venue_list: list[str],
) -> str | None:
    """Cascade body over pre-collected subtree element lists (document
    order), so the bib subtree is walked once by the caller instead of
    three more times here."""
    for idno in idnos:
        if idno.get("type") == "arXiv" and idno.text:
            m = _RE_EXPLICIT.search(idno.text)
            if m:
                return m.group(1)
            break  # reference checks only the first arXiv-typed idno text
    for idno in idnos:
        text = idno.text or ""
        m = _RE_ABS.search(text)
        if m:
            return m.group(1)
        m = _RE_URL.search(text)
        if m:
            return m.group(1)
    for ptr in ptrs:
        target = ptr.get("target") or ""
        m = _RE_URL.search(target)
        if m:
            return m.group(1)
    if venue_list:
        venue_text = venue_list[0]
        m = _RE_ABS.search(venue_text)
        if m:
            return m.group(1)
        if "arxiv" in venue_text.lower():
            all_text = " ".join(bib.itertext())
            m = _RE_PREPRINT.search(all_text)
            if m:
                return m.group(1)
    return None


def parse_tei(xml_bytes: bytes) -> ET.Element:
    """One shared parse of a stored TEI document (gzip-transparent,
    crawler.py:123-128). The XML parse dominates extraction cost at ~30-40 KB
    per doc, so the batch UDF parses ONCE and feeds the same root to both the
    citation and the metadata extractors.

    Parity with the reference's recover-mode parser
    (``etree.XMLParser(recover=True)``, arxiv_util.py:206, asserted by its
    own test_citation_extractor.py:223-261): malformed-but-recoverable
    documents are repaired by :func:`recover_xml` and extracted instead of
    being routed to the failure path. The strict stdlib parse stays the hot
    path — recovery only runs after an ``ET.ParseError``, so well-formed
    Grobid output (the overwhelming majority) pays nothing."""
    if xml_bytes[:2] == b"\x1f\x8b":  # gzip magic — stored form
        xml_bytes = gzip.decompress(xml_bytes)
    try:
        return ET.fromstring(xml_bytes)
    except ET.ParseError:
        return ET.fromstring(recover_xml(xml_bytes))


# --------------------------------------------------------- recovery parser
#
# libxml2-recover semantics, re-stated on a regex tokenizer (no lxml in this
# environment). Mirrored behaviors (each covered in tests/test_extraction.py
# against a hand-repaired well-formed twin — the tree lxml recover=True
# produces for that input):
#   * unclosed element closed implicitly when an ancestor's end tag arrives
#     (the reference's own malformed fixture: <p> missing its </p>)
#   * stray end tags with no matching open element are dropped
#   * still-open elements are closed at end of input
#   * content after the first root element closes is ignored
#   * undefined entity references are dropped; bare '&' and stray '<' that
#     start no tag are dropped (libxml2 skips the offending token)
#   * unquoted / bare attributes are normalized (name=v → name="v")
#   * comments / PIs / doctype are elided (ElementTree skips them anyway —
#     they carry no itertext() content)

_RE_TOKEN = re.compile(
    r"<!\[CDATA\[.*?\]\]>"  # CDATA (kept verbatim)
    r"|<!--.*?-->"  # comment
    r"|<![^>]*>"  # doctype / markup decl
    r"|<\?.*?\?>"  # PI / xml decl
    r"|</\s*([A-Za-z_][\w.:-]*)\s*>"  # end tag
    r"|<\s*([A-Za-z_][\w.:-]*)((?:[^<>\"']|\"[^\"]*\"|'[^']*')*?)(/?)\s*>",  # start tag
    re.DOTALL,
)
_RE_ATTR = re.compile(
    r"([A-Za-z_][\w.:-]*)\s*(?:=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'<>`]+))?"
)
_RE_ENTITY = re.compile(r"&(?:amp|lt|gt|apos|quot|#\d{1,7}|#x[0-9a-fA-F]{1,6});")
_RE_CTRL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")


def _entity_ok(ref: str) -> bool:
    """True if an entity match is safe to keep: named refs always; numeric
    refs only when they denote an XML-1.0-valid character (a ref to e.g.
    U+0003 is as invalid as the raw byte — libxml2-recover drops it)."""
    if not ref.startswith("&#"):
        return True
    body = ref[2:-1]
    cp = int(body[1:], 16) if body[:1] in "xX" else int(body)
    return cp in (0x9, 0xA, 0xD) or (
        0x20 <= cp <= 0xD7FF or 0xE000 <= cp <= 0xFFFD or 0x10000 <= cp <= 0x10FFFF
    )


def _esc_text(s: str) -> str:
    """Sanitize character data: keep defined entity refs, drop undefined
    refs / bare '&' / stray '<' (libxml2-recover drops the offending token),
    escape '>' is unnecessary (valid in content)."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "&":
            m = _RE_ENTITY.match(s, i)
            if m and _entity_ok(m.group(0)):
                out.append(m.group(0))
                i = m.end()
            elif m:
                i = m.end()  # numeric ref to an XML-invalid char — dropped
            else:
                i += 1  # undefined entity / bare & — dropped
                m2 = re.match(r"[A-Za-z#][\w#]*;", s[i:])
                if m2:
                    i += m2.end()
        elif ch == "<":
            i += 1  # stray '<' that opened no tag — dropped
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _esc_attr(s: str) -> str:
    """Escape an attribute value, preserving already-valid entity refs
    (a raw value like ``a &amp; b`` must not double-escape)."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "&":
            m = _RE_ENTITY.match(s, i)
            if m and _entity_ok(m.group(0)):
                out.append(m.group(0))
                i = m.end()
            elif m:
                i = m.end()  # numeric ref to an XML-invalid char — dropped
            else:
                out.append("&amp;")
                i += 1
        elif ch == "<":
            out.append("&lt;")
            i += 1
        elif ch == '"':
            out.append("&quot;")
            i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def recover_xml(xml_bytes: bytes) -> str:
    """Repair malformed XML into a well-formed document string (the
    recover-mode shim behind :func:`parse_tei`). Raises ``ET.ParseError``
    when no root element can be found at all (true garbage stays on the
    failure path, crawler.py:181-186)."""
    text = xml_bytes.decode("utf-8", errors="replace") if isinstance(xml_bytes, bytes) else xml_bytes
    # C0 control chars (except tab/newline/CR) are invalid in XML 1.0 even
    # as character data — libxml2-recover drops them; so do we
    text = _RE_CTRL.sub("", text)
    out: list[str] = []
    stack: list[str] = []
    root_done = False
    saw_root = False
    pos = 0
    for m in _RE_TOKEN.finditer(text):
        if root_done:
            break
        between = text[pos:m.start()]
        pos = m.end()
        if stack:
            out.append(_esc_text(between))
        tok = m.group(0)
        end_name, start_name, attrs_raw, selfclose = m.group(1), m.group(2), m.group(3), m.group(4)
        if start_name is not None:
            if root_done:
                break
            parts = [start_name]
            for am in _RE_ATTR.finditer(attrs_raw or ""):
                name, val = am.group(1), am.group(2)
                if val is None:
                    val = ""
                elif val[:1] in "\"'" and val[:1] == val[-1:]:
                    val = val[1:-1]
                parts.append(f'{name}="{_esc_attr(val)}"')
            if not stack and saw_root:
                continue  # second root element — first root wins
            saw_root = True
            if selfclose:
                out.append(f"<{' '.join(parts)}/>")
            else:
                out.append(f"<{' '.join(parts)}>")
                stack.append(start_name)
        elif end_name is not None:
            if end_name in stack:
                while stack:  # implicit close of unclosed descendants
                    top = stack.pop()
                    out.append(f"</{top}>")
                    if top == end_name:
                        break
                if not stack:
                    root_done = True
            # else: stray end tag — dropped
        elif tok.startswith("<![CDATA["):
            if stack:
                out.append(tok)
        # comments / PIs / doctype — elided
    if stack and pos < len(text):  # tail character data before EOF
        out.append(_esc_text(text[pos:]))
    while stack:  # close everything still open at end of input
        out.append(f"</{stack.pop()}>")
    if not saw_root:
        raise ET.ParseError("recovery found no root element")
    return "".join(out)


def extract_citations(xml_bytes: bytes) -> dict[str, dict[str, Any]]:
    """Parse one TEI document → citations dict (the row oracle and the body
    of the batch UDF — one shared implementation).

    Returns ``{citation_id: {"details": {authors,title,year,venue,arxiv_id},
    "references": [sorted sentences]}}`` in bibliography document order.
    Raises on undecodable/unparsable input (failure path, crawler.py:181-186).
    """
    return citations_from_root(parse_tei(xml_bytes))


def citations_from_root(root: ET.Element) -> dict[str, dict[str, Any]]:
    # Hot path of the crawl headline (~1.5 ms/doc before round 7): the
    # original shape walked each bib subtree ~8 times (authors, titles ×2,
    # dates, monogr, idno ×2, ptr) and built a full parent-pointer dict
    # just to climb from each <ref> to its sentence. This version collects
    # every bib field in ONE subtree pass, and resolves ref→sentence
    # contexts with ONE preorder DFS that tracks the nearest <s>/<p>
    # ancestors on the way down (plus a per-<s> text cache — several refs
    # usually share a sentence). Field-by-field semantics are unchanged;
    # byte parity is pinned by tests/test_extraction.py.
    citations: dict[str, dict[str, Any]] = {}
    references_sets: dict[str, set[str]] = {}
    t_author, t_pers = _t("author"), _t("persName")
    t_title, t_date, t_monogr = _t("title"), _t("date"), _t("monogr")
    t_idno, t_ptr = _t("idno"), _t("ptr")

    for listbibl in root.iter(_t("listBibl")):
        for bib in listbibl.findall(_t("biblStruct")):
            citation_id = bib.get(XML_ID)
            if not citation_id:
                continue
            authors: list[str] = []
            titles_a: list[str] = []
            titles_any: list[str] = []
            years: list[str] = []
            monogrs: list[ET.Element] = []
            idnos: list[ET.Element] = []
            ptrs: list[ET.Element] = []
            for e in bib.iter():
                tag = e.tag
                if tag == t_title:
                    if e.text:
                        titles_any.append(e.text)
                        if e.get("level") == "a":
                            titles_a.append(e.text)
                elif tag == t_author:
                    for pers in e.findall(t_pers):
                        name_parts = [c.text for c in pers.findall(_t("forename")) if c.text]
                        name_parts += [c.text for c in pers.findall(_t("surname")) if c.text]
                        if name_parts:
                            authors.append(" ".join(name_parts))
                elif tag == t_date:
                    if e.get("type") == "published" and e.get("when"):
                        years.append(e.get("when"))
                elif tag == t_monogr:
                    monogrs.append(e)
                elif tag == t_idno:
                    idnos.append(e)
                elif tag == t_ptr:
                    ptrs.append(e)
            titles = titles_a or titles_any
            venues = [
                t.text for mono in monogrs for t in mono.findall(t_title) if t.text
            ]
            arxiv_id = _arxiv_id_from_parts(bib, idnos, ptrs, venues)
            citations[citation_id] = {
                "details": {
                    "authors": authors,
                    "title": titles[0] if titles else None,
                    "year": years[0] if years else None,
                    "venue": venues[0] if venues else None,
                    "arxiv_id": arxiv_id,
                },
                "references": [],
            }
            references_sets[citation_id] = set()

    if citations:
        _collect_ref_contexts(root, references_sets)

    for cid, cit in citations.items():
        cit["references"] = sorted(references_sets[cid])
    return citations


def _collect_ref_contexts(root: ET.Element, references_sets: dict[str, set[str]]) -> None:
    """Resolve every ``ref[@type="bibr"]`` to its sentence context — same
    semantics as the per-ref ancestor climb (:func:`_sentence_context`):
    nearest ``<s>`` wins, else the nearest ``<p>`` with the '. '-split
    fallback — without building parent pointers."""
    # Containment inversion: instead of climbing from every ref to its
    # ancestors (which needs a full parent-pointer dict), iterate the
    # <s>/<p> elements (C-level tag-filtered .iter) and find the bibr refs
    # INSIDE each. An ancestor chain is visited outer→inner in preorder,
    # so "last writer wins" per ref reproduces the nearest-ancestor rule;
    # a ref under any <s> never takes the <p> fallback, exactly like the
    # climb.
    t_s, t_p, t_ref = _t("s"), _t("p"), _t("ref")
    s_of: dict[int, tuple[ET.Element, ET.Element]] = {}
    p_of: dict[int, tuple[ET.Element, ET.Element]] = {}
    for s in root.iter(t_s):
        for ref in s.iter(t_ref):
            if ref.get("type") == "bibr":
                s_of[id(ref)] = (ref, s)
    for p in root.iter(t_p):
        for ref in p.iter(t_ref):
            if ref.get("type") == "bibr" and id(ref) not in s_of:
                p_of[id(ref)] = (ref, p)
    text_cache: dict[int, str] = {}
    for ref, s in s_of.values():
        target = (ref.get("target") or "").lstrip("#")
        rs = references_sets.get(target)
        if rs is None:
            continue
        key = id(s)
        sentence = text_cache.get(key)
        if sentence is None:
            sentence = _get_text(s)
            text_cache[key] = sentence
        if sentence:
            rs.add(sentence)
    for ref, p in p_of.values():
        target = (ref.get("target") or "").lstrip("#")
        rs = references_sets.get(target)
        if rs is None:
            continue
        para_text = _get_text(p)
        ref_text = _get_text(ref)
        for sent in para_text.split(". "):
            if ref_text in sent:
                sent = sent.strip()
                if sent:
                    rs.add(sent)
                break


def extract_paper_metadata(xml_bytes: bytes) -> dict[str, Any]:
    """Paper-level metadata from the TEI header — the ProcessedPaper fields
    the reference gets from the arXiv API (models.py:38-56,
    get_arxiv_metadata arxiv_util.py:67-88): title, authors, abstract,
    published, categories (Grobid textClass keywords stand in for the API's
    category list). Missing elements yield None/[] — the reference's
    Optional fields."""
    return metadata_from_root(parse_tei(xml_bytes))


def metadata_from_root(root: ET.Element) -> dict[str, Any]:
    header = root.find(_t("teiHeader"))
    out: dict[str, Any] = {
        "title": None,
        "authors": [],
        "abstract": None,
        "published": None,
        "categories": [],
    }
    if header is None:
        return out
    title_el = header.find(f"{_t('fileDesc')}/{_t('titleStmt')}/{_t('title')}")
    if title_el is not None and title_el.text:
        out["title"] = title_el.text.strip()
    src = header.find(f"{_t('fileDesc')}/{_t('sourceDesc')}")
    if src is not None:
        for pers in src.iter(_t("persName")):
            parts = [e.text for e in pers.findall(_t("forename")) if e.text]
            parts += [e.text for e in pers.findall(_t("surname")) if e.text]
            if parts:
                out["authors"].append(" ".join(parts))
    pub = header.find(f"{_t('fileDesc')}/{_t('publicationStmt')}/{_t('date')}")
    if pub is not None:
        out["published"] = pub.get("when") or (pub.text or "").strip() or None
    abs_el = header.find(f"{_t('profileDesc')}/{_t('abstract')}")
    if abs_el is not None:
        txt = " ".join("".join(p.itertext()).strip() for p in abs_el.iter(_t("p")))
        out["abstract"] = txt.strip() or None
    for term in header.iter(_t("term")):
        if term.text and term.text.strip():
            out["categories"].append(term.text.strip())
    return out


def canonical_extraction_json(citations: dict[str, dict[str, Any]]) -> str:
    """Byte-stable canonical form of an extraction — the string compared for
    the byte-identical-per-url invariant (FIXTURES.md §5 format)."""
    return json.dumps(citations, sort_keys=True, ensure_ascii=False, separators=(",", ":"))


CITATION_STRUCT = T.StructType(
    [
        T.StructField("citation_id", T.StringType()),
        T.StructField("authors", T.ArrayType(T.StringType())),
        T.StructField("title", T.StringType()),
        T.StructField("year", T.StringType()),
        T.StructField("venue", T.StringType()),
        T.StructField("arxiv_id", T.StringType()),
        T.StructField("reference_contexts", T.ArrayType(T.StringType())),
        T.StructField("num_references", T.IntegerType()),
    ]
)
# ProcessedCitation parity: models.py:25-35 (num_references = len(references),
# crawler.py:144)

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("citations", T.ArrayType(CITATION_STRUCT)),
        T.StructField("extracted_text", T.StringType()),
        T.StructField("num_citations", T.IntegerType()),
        # ProcessedPaper metadata (models.py:38-56) — header-derived
        T.StructField("title", T.StringType()),
        T.StructField("authors", T.ArrayType(T.StringType())),
        T.StructField("abstract", T.StringType()),
        T.StructField("published", T.StringType()),
        T.StructField("categories", T.ArrayType(T.StringType())),
    ]
)


def extract_pages(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    passthrough: bool = False,
) -> DataFrame:
    """Engine extraction: ``(url, html)`` → ``EXTRACTED_SCHEMA`` rows.

    ``mapInArrow``: Arrow-batched; each batch is processed with one Python
    call per *document* (XML parsing is inherently per-document — the same
    granularity the reference pays per Grobid response). Extraction errors
    yield ``ok=false`` rows (→ failed status, crawler.py:181-186) instead of
    failing the task.

    ``passthrough=True`` carries every other input column through the UDF
    untouched (matched by name on the Arrow boundary). The round loop uses
    this to keep the wave's scheduling columns attached to their extraction
    output — no join needed to reunite them afterwards.
    """

    meta_cols = ["title", "authors", "abstract", "published", "categories"]
    if passthrough:
        out_schema = T.StructType(
            [f for f in pages.schema.fields if f.name != html_col]
            + [f for f in EXTRACTED_SCHEMA.fields if f.name != "url"]
        )
    else:
        out_schema = EXTRACTED_SCHEMA

    # Round-7 optimization (guide §4.2): mapInArrow instead of mapInPandas.
    # The passthrough columns (the wave's ~8 scheduling columns) are sliced
    # straight out of the input RecordBatch with zero conversion, and the
    # extraction output — including the nested citations list<struct> — is
    # assembled once per batch by pyarrow's C++ python-object converter
    # with explicit types, skipping the pandas object-column round trip
    # that cost ~0.5 ms/doc at crawl-bench scale.
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(out_schema)
    out_names = [f.name for f in out_schema.fields]
    gen_names = ["ok", "citations", "extracted_text", "num_citations", *meta_cols]
    pass_names = [n for n in out_names if n not in gen_names]
    gen_types = {n: arrow_schema.field(n).type for n in gen_names}

    def process(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            html_arr = rb.column(rb.schema.get_field_index(html_col))
            out: dict[str, list] = {c: [] for c in gen_names}
            o_ok = out["ok"]
            o_cit = out["citations"]
            o_txt = out["extracted_text"]
            o_n = out["num_citations"]
            for html in html_arr:
                # parse once; both extractors walk the same tree
                try:
                    root = parse_tei(html.as_py())
                    cits = citations_from_root(root)
                    rows = [
                        {
                            "citation_id": cid,
                            "authors": c["details"]["authors"],
                            "title": c["details"]["title"],
                            "year": c["details"]["year"],
                            "venue": c["details"]["venue"],
                            "arxiv_id": c["details"]["arxiv_id"],
                            "reference_contexts": c["references"],
                            "num_references": len(c["references"]),
                        }
                        for cid, c in cits.items()
                    ]
                    meta = metadata_from_root(root)
                    o_ok.append(True)
                    o_cit.append(rows)
                    o_txt.append(canonical_extraction_json(cits))
                    o_n.append(len(rows))
                    for c in meta_cols:
                        out[c].append(meta[c])
                except Exception:
                    o_ok.append(False)
                    o_cit.append([])
                    o_txt.append(None)
                    o_n.append(0)
                    for c in meta_cols:
                        out[c].append([] if c in ("authors", "categories") else None)
            cols = []
            for name in out_names:
                if name in gen_types:
                    cols.append(pa.array(out[name], type=gen_types[name]))
                else:
                    cols.append(rb.column(rb.schema.get_field_index(name)))
            yield pa.RecordBatch.from_arrays(cols, names=out_names)

    src = pages if passthrough else pages.select(url_col, html_col)
    return src.mapInArrow(process, schema=out_schema)
