"""Unit tests for the HTML main-content extractor (north-rule F1/F2
generalization: DOM + link-density boilerplate strip, labeled spans)."""

from pdf_extractors_spark.extractors import html_content

HTML = (
    "<html><head><style>p{}</style><script>nav()</script></head><body>"
    '<nav><a href="/a">Home</a><a href="/b">Pricing</a><a href="/c">Blog</a></nav>'
    '<header><div class="cookie-banner">We use cookies <a href="#">Accept</a></div></header>'
    "<main><article><h1>Quarterly report</h1>"
    "<p>The quarterly filing shows a material increase in logistics throughput.</p>"
    "<p>Total amount without VAT 475,00 NOK due Delivery date 04.04.2022</p>"
    "</article></main>"
    '<footer>© 2024 <a href="#">Careers</a><a href="#">Contact</a></footer>'
    "</body></html>"
)


def test_main_content_kept_boilerplate_dropped():
    out = html_content.extract(HTML)
    text = out["extracted_text"]
    assert "quarterly filing" in text
    assert "Quarterly report" in text
    assert "Home" not in text  # nav dropped
    assert "cookies" not in text  # cookie banner dropped
    assert "Careers" not in text  # footer dropped
    assert "nav()" not in text  # script dropped


def test_spans_found():
    out = html_content.extract(HTML)
    labels = {s["label"] for s in out["spans"]}
    assert "amount_nok" in labels
    assert "date" in labels
    for s in out["spans"]:
        assert out["extracted_text"][s["start"] : s["end"]] == s["value"]


def test_link_density_filter():
    # a link farm inside main is still dropped (density ≥ 0.33)
    html = (
        "<html><body><main>"
        '<p><a href="#">x</a> <a href="#">y</a> <a href="#">z</a></p>'
        "<p>Real sentence content that is long enough to keep here.</p>"
        "</main></body></html>"
    )
    text = html_content.extract(html)["extracted_text"]
    assert "Real sentence content" in text
    assert "x y z" not in text


def test_plain_text_fallback():
    plain = "\n".join(
        [
            "Useful content line one.",
            "Cambridge Books Online © Cambridge University Press, 2010",
            "https://doi.org/10.1017",
            "Useful content line two.",
        ]
    )
    text = html_content.extract(plain)["extracted_text"]
    assert text == "Useful content line one.\nUseful content line two."
