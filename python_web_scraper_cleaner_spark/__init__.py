"""python_web_scraper_cleaner_spark — a PySpark-native crawl/clean engine.

Brand-new implementation (not a port) of the capabilities of the reference
repo ``amite/python_web_scraper_cleaner``: HTML→clean-text extraction, URL
dedup, frontier scheduling with politeness, corpus search/scoring, plus the
large-scale training-data operators (dedup families, ANN, text analysis)
required at 10^10-URL scale. See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"
