from neo4j_document_pipeline_ray.functions.html_extract import html_to_text
from neo4j_document_pipeline_ray.functions.rules import extract_rule_triples
from neo4j_document_pipeline_ray.sources import corpus


class TestRules:
    def test_normal_sentence(self):
        got = extract_rule_triples('The Goal "Plan A" supports the Outcome "Result B".')
        assert got == [{
            "subject": "Plan A", "predicate": "supports", "object": "Result B",
            "subject_type": "Goal", "object_type": "Outcome",
        }]

    def test_multiword_predicate(self):
        got = extract_rule_triples('The Policy "X" depends on the Sector "Y".')
        assert got[0]["predicate"] == "depends on"

    def test_timeline(self):
        got = extract_rule_triples('The Vision "V" spans from 2021 to 2025.')
        assert got == [{
            "subject": "V", "predicate": "spans",
            "object": {"start": "2021", "end": "2025"},
            "subject_type": "Vision", "object_type": "Time_Period",
        }]

    def test_malformed_timeline(self):
        got = extract_rule_triples('The Vision "V" spans from 2021 to an unspecified date.')
        assert got[0]["object"] == {"start": "2021", "end": ""}

    def test_distribution(self):
        got = extract_rule_triples(
            'The Sector "S" records initiative counts for pillar "Economy": '
            "planned=3, active=5, total=8."
        )
        assert got == [{
            "subject": "S", "predicate": "records",
            "object": {"Economy": {"planned": 3, "active": 5, "total": 8}},
            "subject_type": "Sector", "object_type": "Pillar",
        }]

    def test_prose_yields_nothing(self):
        assert extract_rule_triples("Plain prose without templates.") == []
        assert extract_rule_triples('The Unknown "X" frobs the Thing "Y".') == []


class TestHtmlExtract:
    def test_boilerplate_stripped(self):
        html = (
            "<html><head><script>x()</script><style>.a{}</style></head>"
            "<body><nav>menu</nav><p>keep me</p>"
            "<footer>legal</footer><aside>ads</aside></body></html>"
        )
        assert html_to_text(html) == "keep me"

    def test_headings_and_bold(self):
        html = "<h2>Title</h2><p>has <strong>bold</strong> text</p>"
        assert html_to_text(html) == "## Title\n\nhas **bold** text"

    def test_list(self):
        html = "<ul><li>one</li><li>two</li></ul>"
        assert html_to_text(html) == "- one\n- two"

    def test_table_rendered_as_markdown(self):
        html = (
            "<table><tr><th>E</th><th>P</th></tr>"
            "<tr><td>A</td><td>1</td></tr></table>"
        )
        assert html_to_text(html) == "| E | P |\n| --- | --- |\n| A | 1 |"

    def test_br_inside_paragraph(self):
        assert html_to_text("<p>a<br>b</p>") == "a\nb"

    def test_entities_unescaped(self):
        assert html_to_text("<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"


class TestCorpusRoundTrip:
    def test_byte_identity_500_docs(self):
        for i in range(500):
            plan = corpus.make_doc_plan(i)
            md = corpus.render_markdown(plan["blocks"])
            assert html_to_text(corpus.render_html(plan)) == md, f"doc {i}"

    def test_mixed_docs_single_chunk(self):
        from neo4j_document_pipeline_ray.functions.chunking import chunk_text

        checked = 0
        for i in range(500):
            plan = corpus.make_doc_plan(i)
            if plan["doc_type"] == "mixed":
                md = corpus.render_markdown(plan["blocks"])
                assert len(chunk_text(md, corpus.CHUNK_TOKENS)) == 1
                checked += 1
        assert checked > 10

    def test_feature_coverage(self):
        kinds = set()
        types = set()
        for i in range(400):
            plan = corpus.make_doc_plan(i)
            types.add(plan["doc_type"])
            for t in corpus.truth_for_plan(plan):
                kinds.add(t["object_kind"])
        assert types == {"sent", "table", "mixed", "noise", "dup"}
        assert kinds == {"normal", "timeline", "distribution"}

    def test_determinism(self):
        a = corpus.pages_batch([0, 1, 2])
        b = corpus.pages_batch([0, 1, 2])
        assert a.equals(b)
