"""Quality-filter rule constants — the single source of truth.

Both the distributed Spark pipeline and the single-process reference
labeler (tests/reference_labeler.py) import these constants, so the
keep/drop decision is defined once (FIXTURES.md §F1: "a single-process
Python labeler using the exact same rule constants").

The rule set is Gopher/C4-style (per BASELINE.json north_star): word-count
bounds, mean-word-length band, symbol-to-word ratio, bullet / ellipsis
line fractions, stopword evidence, alphabetic-word fraction, duplicate-line
fraction, language-ID allowlist, and an n-gram LM perplexity cap — echoing
the reference profiler's threshold-gated validity discipline
(reference ``api/services/types.py:94-98`` dominance/cardinality thresholds;
``api/services/keys.py:98-133`` min_score gates).
"""

from __future__ import annotations

# --- Gopher-style heuristic bounds -------------------------------------
MIN_WORDS = 10
MAX_WORDS = 20000
MIN_MEAN_WORD_LENGTH = 3.0
MAX_MEAN_WORD_LENGTH = 12.0
MAX_SYMBOL_TO_WORD_RATIO = 0.10  # '#' chars + '...' runs per word
MAX_BULLET_LINE_FRACTION = 0.90
MAX_ELLIPSIS_LINE_FRACTION = 0.30
MIN_STOPWORD_HITS = 2  # C4-style: distinct stopwords present
MIN_ALPHA_WORD_FRACTION = 0.80
MAX_DUP_LINE_FRACTION = 0.30
# Gopher-style n-gram repetition (north_star "repetition n-gram dedup
# counts"): fraction of word-2-gram positions whose 2-gram already occurred
# (1 - distinct/total). Clean prose sits well under 0.3; looped boilerplate
# ("buy now buy now …") approaches 1.
MAX_DUP_2GRAM_FRACTION = 0.50
# Mean length of non-empty trimmed lines (north_star "mean line length").
# Web prose sits at ~30-110 chars/line (fixture p99 ≈ 100); thousands of
# chars per line is minified JS/CSS or an unbroken data blob — C4-style
# structure filter, deliberately far above prose so it only fires on blobs.
MAX_MEAN_LINE_LENGTH = 2000.0

# C4's stopword-evidence list.
STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with", "a", "in")

# --- Language ID --------------------------------------------------------
KEEP_LANGS = ("en",)
MIN_LANGID_MARGIN = 0.0  # argmax wins; margin kept for tuning

# --- Perplexity ---------------------------------------------------------
# Hash-unigram LM trained on the seeded English corpus (functions/textmodel).
# Clean English ≈ e^7-e^8 under the 2^14-bucket model; gibberish and
# non-English sit far above. Calibrated on the synthetic fixture.
MAX_LOG_PERPLEXITY = 9.2

# Ordered drop-reason codes (error-code registry discipline, reference
# ``api/services/errors.py:12-56``).
RULE_ORDER = (
    "lang",
    "too_few_words",
    "too_many_words",
    "mean_word_length",
    "mean_line_length",
    "symbol_ratio",
    "bullet_lines",
    "ellipsis_lines",
    "stopwords",
    "alpha_words",
    "dup_lines",
    "dup_2grams",
    "perplexity",
)
