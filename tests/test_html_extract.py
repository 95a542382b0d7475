"""HTML kernel tests: tokenizer, DOM, boilerplate classifier, rendering."""

from smart_ocr_spark.kernel.html_extract import (
    classify_blocks,
    decode_entities,
    extract_html,
    parse_html,
    segment_blocks,
    table_to_markdown,
)


def test_decode_entities():
    assert decode_entities("a &amp; b &lt;c&gt;") == "a & b <c>"
    assert decode_entities("&#65;&#x42;") == "AB"
    assert decode_entities("&unknown;") == "&unknown;"
    assert decode_entities("&#xD800;") == "�"


def test_parse_basic_tree():
    root = parse_html("<div><p>hello <b>bold</b></p></div>")
    div = root.children[0]
    assert div.tag == "div"
    p = div.children[0]
    assert p.tag == "p"
    assert p.children[0].text == "hello "
    assert p.children[1].tag == "b"


def test_parse_unclosed_and_void():
    root = parse_html("<p>one<p>two<br><img src=x>")
    tags = [c.tag for c in root.children]
    assert tags.count("p") == 2  # implicit close


def test_script_style_swallowed():
    text, _ = extract_html(
        "<html><head><script>var x = '<p>fake</p>';</script>"
        "<style>p{}</style></head><body><p>"
        + "real content word " * 10
        + "</p></body></html>"
    )
    assert "fake" not in text
    assert "real content" in text


def test_comments_ignored():
    text, _ = extract_html("<body><!-- hidden --><p>" + "visible word " * 12 + "</p></body>")
    assert "hidden" not in text


def test_boilerplate_dropped():
    html = (
        "<body><nav><a href='/'>home</a> <a href='/x'>about</a></nav>"
        "<p>" + "main article content word " * 10 + "</p>"
        "<footer><a href='/'>contact</a></footer></body>"
    )
    text, _ = extract_html(html, "layout")
    assert "main article" in text
    assert "home" not in text
    assert "contact" not in text


def test_basic_variant_keeps_boilerplate():
    html = (
        "<body><nav>navigation links here</nav>"
        "<p>" + "content word " * 10 + "</p></body>"
    )
    text, _ = extract_html(html, "basic")
    assert "navigation links here" in text


def test_link_farm_dropped_in_layout():
    html = "<body><div>" + "".join(
        f"<a href='/{i}'>link{i}</a> " for i in range(20)
    ) + "</div></body>"
    text, _ = extract_html(html, "layout")
    assert text == ""


def test_short_block_kept_near_content():
    html = (
        "<body><p>Short intro here with several words.</p>"
        "<p>" + "long content word " * 15 + "</p></body>"
    )
    text, _ = extract_html(html, "layout")
    assert "Short intro" in text


def test_table_markdown():
    md = table_to_markdown([["a", "b"], ["1", "2"], ["3"]])
    assert md == "| a | b |\n| --- | --- |\n| 1 | 2 |\n| 3 |  |"


def test_table_rendering_in_document():
    html = (
        "<body><p>" + "intro words here " * 10 + "</p>"
        "<table><tr><th>h1</th><th>h2</th></tr>"
        "<tr><td>a</td><td>b</td></tr></table></body>"
    )
    text, signals = extract_html(html, "layout")
    assert "| h1 | h2 |" in text
    assert "| --- | --- |" in text
    assert "| a | b |" in text
    assert signals["has_tables"] is True


def test_headings_and_lists():
    html = (
        "<body><h1>Title Here</h1><h2>Sub Part</h2>"
        "<ul><li>first item words</li><li>second item words</li></ul>"
        "<p>" + "body words " * 15 + "</p></body>"
    )
    text, _ = extract_html(html, "layout")
    assert "# Title Here" in text
    assert "## Sub Part" in text
    assert "- first item words" in text


def test_signals():
    html = (
        "<body><h1>T</h1><p>x</p><img src='a.png'>"
        "<p>$$x^2$$ \\frac{a}{b}</p></body>"
    )
    _, signals = extract_html(html)
    assert signals["has_equations"] is True
    assert signals["has_figures"] is True
    assert signals["n_images"] == 1


def test_nested_inline_preserved():
    text, _ = extract_html(
        "<body><p>A <em>nested <strong>chain</strong></em> of "
        + "inline tags word " * 8
        + "</p></body>"
    )
    assert "A nested chain of" in text


def test_entities_in_text():
    text, _ = extract_html(
        "<body><p>" + "filler word " * 12 + "a &amp; b &#233;</p></body>"
    )
    assert "a & b \u00e9" in text


def test_density_variant_stricter():
    # A block with link density between 0.20 and 0.333: layout keeps it,
    # density drops it.
    words = "word " * 30
    linked = "<a href='/x'>linked text bits</a>"
    html = f"<body><p>{words}{linked}</p></body>"
    blocks = segment_blocks(parse_html(html))
    ld = blocks[0].link_density
    assert 0.0 < ld < 0.333
    layout_keep = classify_blocks(blocks, "layout")
    assert layout_keep[0] is True


def test_malformed_html_no_crash():
    for frag in ["<p>unclosed", "<<<>>>", "</close-only>", "<a href=>x", "", "<table><tr>"]:
        extract_html(frag)  # must not raise


def test_entities_decoded_exactly_once():
    from smart_ocr_spark.kernel.extract import extract_payload_full

    words = "filler words to pass the extraction floors " * 3
    html = f"<html><body><p>{words} a &amp;lt; b and &amp;amp; c</p></body></html>"
    r = extract_payload_full(html.encode())
    assert "a &lt; b" in r["layout_text"], r["layout_text"]
    assert "&amp; c" in r["layout_text"]
    assert "a < b" not in r["layout_text"]


def test_mixed_content_preserves_reading_order():
    from smart_ocr_spark.kernel.html_extract import parse_html, segment_blocks

    html = "<html><body><div>intro text here<p>nested para</p>tail text after</div></body></html>"
    blocks = segment_blocks(parse_html(html))
    texts = [b.text for b in blocks]
    assert texts == ["intro text here", "nested para", "tail text after"], texts


def test_gt_inside_quoted_attribute():
    """'>' inside alt/title/onclick must not end the tag (markup tail
    leaked into extracted text before)."""
    from smart_ocr_spark.kernel.html_extract import (
        classify_blocks, parse_html, render_blocks, segment_blocks,
    )

    html = '<html><body><p>Hello <img alt="a > b" src="x.png"> world</p></body></html>'
    blocks = segment_blocks(parse_html(html))
    text = render_blocks(blocks, classify_blocks(blocks, "basic"), "basic")
    assert 'src=' not in text and '"' not in text
    assert "Hello" in text and "world" in text


def test_apostrophe_in_unquoted_attribute_value():
    """ADVICE r2: <a title=John's href=x> — HTML5 treats the apostrophe
    as part of the unquoted value.  Scanning it as a quote opener finds
    no match, returns -1, and silently drops all remaining text."""
    from smart_ocr_spark.kernel.html_extract import (
        classify_blocks, parse_html, render_blocks, segment_blocks,
    )

    html = (
        "<html><body><p>Before <a title=John's href=x>link text</a>"
        " after</p><p>Tail paragraph survives the tag.</p></body></html>"
    )
    blocks = segment_blocks(parse_html(html))
    text = render_blocks(blocks, classify_blocks(blocks, "basic"), "basic")
    assert "Before" in text and "link text" in text and "after" in text
    assert "Tail paragraph survives" in text
    assert "href" not in text


def test_optional_end_tags_table_grid():
    """HTML5 optional </td>/</tr>: rows must not nest into the previous
    cell."""
    from smart_ocr_spark.kernel.html_extract import parse_html, segment_blocks

    html = "<table><tr><td>A1<td>A2<tr><td>B1<td>B2</table>"
    blocks = segment_blocks(parse_html(html))
    [tbl] = [b for b in blocks if b.kind == "table"]
    assert tbl.table_rows == [["A1", "A2"], ["B1", "B2"]]


def test_caption_text_extracted():
    from smart_ocr_spark.kernel.html_extract import parse_html, segment_blocks

    html = "<table><caption>Figure 1: results</caption><tr><td>A</td></tr></table>"
    blocks = segment_blocks(parse_html(html))
    kinds = {b.kind: b.text for b in blocks}
    assert kinds.get("caption") == "Figure 1: results"


def test_unquoted_url_trailing_slash_not_self_closing():
    """href=http://x.com/ — the solidus is part of the unquoted value,
    not a self-closing marker; anchor text must count as link chars."""
    from smart_ocr_spark.kernel.html_extract import parse_html, segment_blocks

    html = "<div><a href=http://example.com/>this link here</a></div>"
    blocks = segment_blocks(parse_html(html))
    [b] = blocks
    assert b.link_chars == len("this link here")


def test_pre_block_survives_classification():
    """Short code blocks are structure carriers, not smoothing fodder."""
    from smart_ocr_spark.kernel.html_extract import (
        classify_blocks, parse_html, segment_blocks,
    )

    html = (
        "<html><body><nav><a href=x>menu</a></nav>"
        "<h1>Title</h1><p>short intro</p>"
        "<pre>x = compute(y)</pre>"
        "<nav><a href=y>more nav</a></nav></body></html>"
    )
    blocks = segment_blocks(parse_html(html))
    keep = classify_blocks(blocks, "layout")
    kept_kinds = {b.kind for b, k in zip(blocks, keep) if k}
    assert "pre" in kept_kinds


class TestCollapseWsFastPath:
    def test_fuzz_against_regex(self):
        import random
        import re

        from smart_ocr_spark.kernel.html_extract import _WS_RE, _collapse_ws

        rng = random.Random(42)
        chars = "ab \t\r\n\f\v\xa0cdé漢  ."
        for _ in range(30000):
            s = "".join(
                rng.choice(chars) for _ in range(rng.randrange(0, 30))
            )
            assert _collapse_ws(s) == _WS_RE.sub(" ", s).strip(), repr(s)
