"""HTML parse + query parse golden tests (parser_test.go:5-26, query_preprocess.go)."""

from search_engine_spark.oracle.reference import parse_document
from search_engine_spark.operators.search import parse_query

GOLDEN_HTML = """
<!DOCTYPE html>
<html>
    <head>
        <title lang="xxx">==title==
</title>
        <style> css </style>
    </head>
    <body>
        <div> text1 <span>text2</span> text3  </div>
        <script> js code </script>
    </body>
</html>
"""


def test_parser_golden_fixture():
    # parser_test.go:5-26, reused verbatim
    pd = parse_document(GOLDEN_HTML)
    assert pd is not None
    title, body = pd
    assert title == "==title=="
    assert body == "text1 text2 text3"


def test_no_title_dropped():
    # parser.go:26-28: document without <title> → nil → dropped
    assert parse_document("<html><body>hello</body></html>") is None


def test_spark_parse_matches_oracle(spark):
    from search_engine_spark.operators.parse import parse_html_documents

    docs = [
        (GOLDEN_HTML,),
        ("<html><body>no title</body></html>",),
        ("<TITLE>upper</TITLE>rest <b>bold</b>",),
    ]
    df = spark.createDataFrame(docs, "content string")
    out = {r["content"]: (r["title"], r["body"]) for r in parse_html_documents(df).collect()}
    for (content,) in docs:
        exp = parse_document(content)
        if exp is None:
            assert content not in out
        else:
            assert out[content] == exp, content


def test_parse_query():
    pq = parse_query("hello -world site:a.com site:b.com foo -")
    assert pq.keywords == ["hello", "foo"]
    assert pq.exclusions == ["world", ""]
    assert pq.site == "a.com"
    assert parse_query("").keywords == []
    assert parse_query("   ").keywords == []


def test_has_illegal_keywords():
    from search_engine_spark.operators.search import has_illegal_keywords

    assert not has_illegal_keywords("hello", None)
    assert not has_illegal_keywords("hello", [])
    assert has_illegal_keywords("buy illegal thing", ["illegal"])
    assert not has_illegal_keywords("clean query", ["illegal", "bad"])
    assert has_illegal_keywords("so bad", ["illegal", "bad"])
