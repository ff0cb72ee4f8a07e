"""robots.txt text parsing (RFC 9309 subset) → frontier rule table."""

from warc2zim_spark.frontier.robotstxt import parse_robots_txt

BODY = """
# comments are ignored
User-agent: *
Disallow: /private/
Allow: /private/ok
Crawl-delay: 2

User-agent: fancybot
Disallow: /
"""


class TestParse:
    def test_star_group(self):
        rules = parse_robots_txt("h.example", BODY)
        assert ("h.example", "disallow", "/private/", 2000) in rules
        assert ("h.example", "allow", "/private/ok", 2000) in rules
        # fancybot group not included for agent '*'
        assert ("h.example", "disallow", "/", None) not in rules

    def test_specific_agent_replaces_star(self):
        rules = parse_robots_txt("h.example", BODY, agent="FancyBot")
        assert rules == [("h.example", "disallow", "/", None)]

    def test_empty_disallow_means_allow_all(self):
        rules = parse_robots_txt("h", "User-agent: *\nDisallow:\n")
        assert rules == []

    def test_delay_only_group(self):
        rules = parse_robots_txt("h", "User-agent: *\nCrawl-delay: 1.5\n")
        assert rules == [("h", "allow", "/", 1500)]

    def test_multi_agent_group(self):
        body = "User-agent: a\nUser-agent: *\nDisallow: /x\n"
        assert parse_robots_txt("h", body) == [("h", "disallow", "/x", None)]

    def test_garbage_tolerated(self):
        assert parse_robots_txt("h", None) == []
        assert parse_robots_txt("h", "random text\nno directives") == []
        assert parse_robots_txt("h", "User-agent: *\nCrawl-delay: soon\n") == []

    def test_distributed_parse_feeds_robots_gate(self, spark):
        """Text → rules → the existing robots_allowed operator end-to-end."""
        import pyspark.sql.functions as F

        from warc2zim_spark.frontier.politeness import robots_allowed
        from warc2zim_spark.frontier.robotstxt import robots_rules_from_text

        bodies = spark.createDataFrame(
            [
                ("a.example", "User-agent: *\nDisallow: /blocked/\n"),
                ("b.example", "User-agent: *\nDisallow: /\n"),
            ],
            "host string, body string",
        )
        rules = robots_rules_from_text(bodies)
        cands = spark.createDataFrame(
            [
                ("a.example/ok", "a.example"),
                ("a.example/blocked/x", "a.example"),
                ("b.example/anything", "b.example"),
                ("c.example/no-robots", "c.example"),
            ],
            "surt_key string, host string",
        )
        allowed = {r.surt_key for r in robots_allowed(cands, rules).collect()}
        assert allowed == {"a.example/ok", "c.example/no-robots"}
