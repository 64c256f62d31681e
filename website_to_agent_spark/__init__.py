"""PySpark-native crawl/extract engine with the capabilities of
jhynes6/website-to-agent (see SURVEY.md)."""

__version__ = "0.1.0"
