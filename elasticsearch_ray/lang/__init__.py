"""Language analysis: Snowball-family stemmers, light stemmers, stop sets and
per-language analyzers (the reference's ~30 language analyzer registrations,
modules/analysis-common/.../CommonAnalysisPlugin.java:180-223, and the stemmer
name table of StemmerTokenFilterFactory, :230-303)."""

from .analyzers import register_language_analyzers
from .snowball import SNOWBALL_STEMMERS, snowball_stem
from .stopwords import STOP_SETS

__all__ = [
    "SNOWBALL_STEMMERS",
    "snowball_stem",
    "STOP_SETS",
    "register_language_analyzers",
]
