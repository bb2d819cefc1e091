from neo4j_document_pipeline_ray.functions.tables import (
    extract_table_triples,
    is_separator_line,
    split_cells,
)


def t(s, p, o):
    return {
        "subject": s, "predicate": p, "object": o,
        "subject_type": "Entity", "object_type": "Value",
    }


class TestSeparator:
    def test_variants(self):
        assert is_separator_line("| --- | --- |")
        assert is_separator_line("|:---:|---:|")
        assert is_separator_line("  | --- |  ")
        assert not is_separator_line("| a | b |")
        assert not is_separator_line("---")


class TestSplitCells:
    def test_pipes_trimmed(self):
        assert split_cells("| a | b |") == ["a", "b"]
        assert split_cells("a | b") == ["a", "b"]
        assert split_cells("| a |  | c |") == ["a", "", "c"]


class TestExtract:
    def test_basic_table(self):
        text = (
            "| Entity | Budget | Status |\n"
            "| --- | --- | --- |\n"
            "| Plan A | RM 5 | Approved |\n"
            "| Plan B | RM 9 | Draft |"
        )
        got = extract_table_triples(text)
        assert got == [
            t("Plan A", "Budget", "RM 5"), t("Plan A", "Status", "Approved"),
            t("Plan B", "Budget", "RM 9"), t("Plan B", "Status", "Draft"),
        ]

    def test_empty_cells_skipped(self):
        text = "| E | P1 | P2 |\n| --- | --- | --- |\n| S |  | v |"
        assert extract_table_triples(text) == [t("S", "P2", "v")]

    def test_row_with_empty_subject_stops_scan(self):
        text = (
            "| E | P |\n| --- | --- |\n| A | 1 |\n|  | 2 |\n| B | 3 |"
        )
        # the empty-subject row breaks the table; the B row is then
        # re-examined but has no separator after it → ignored
        assert extract_table_triples(text) == [t("A", "P", "1")]

    def test_blockquote_breaks_table(self):
        text = "| E | P |\n| --- | --- |\n| A | 1 |\n> quote |\n| B | 2 |"
        assert extract_table_triples(text) == [t("A", "P", "1")]

    def test_row_wider_than_header_clipped(self):
        text = "| E | P |\n| --- | --- |\n| A | 1 | extra |"
        assert extract_table_triples(text) == [t("A", "P", "1")]

    def test_no_separator_no_table(self):
        assert extract_table_triples("| a | b |\n| c | d |") == []

    def test_whitespace_normalized(self):
        text = "| E | P  Q |\n| --- | --- |\n| A  B | v   w |"
        assert extract_table_triples(text) == [t("A B", "P Q", "v w")]

    def test_two_tables(self):
        text = (
            "| E | P |\n| --- | --- |\n| A | 1 |\n"
            "\nprose\n\n"
            "| E | Q |\n| --- | --- |\n| B | 2 |"
        )
        assert extract_table_triples(text) == [t("A", "P", "1"), t("B", "Q", "2")]
