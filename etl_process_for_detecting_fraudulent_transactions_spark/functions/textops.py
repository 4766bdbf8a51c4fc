"""Text-analysis Column builders: n-gram language ID, quality scoring,
token counting, fingerprinting — all pure Catalyst expressions (no UDFs).

``lang_id_ngram`` is a real character-trigram frequency heuristic: score each
candidate language by how many of its high-frequency trigrams appear in the
text, normalized by text length; argmax with deterministic tiebreak. Profiles
below are compact hand-rolled approximations of common trigram tables for a
few Latin-script languages (public linguistic knowledge); extend per corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# high-frequency character trigrams per language (space-padded text)
TRIGRAM_PROFILES: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", "he ", " an", "and", "nd ", "ing", "ng ", " of", "of "),
    "de": ("er ", " de", "der", "ein", "ich", "sch", "ch ", " un", "und", "en "),
    "fr": (" de", "de ", " le", "le ", "es ", "ent", " la", "la ", "ion", "que"),
    "es": (" de", "de ", " la", "la ", "os ", " el", "el ", "ión", "ent", "que"),
    "it": (" di", "di ", " la", " il", "il ", "re ", "to ", "one", " co", "che"),
}


def lang_id_ngram(text: Column | str, min_score: float = 1.0) -> Column:
    """Predict language by counting profile-trigram occurrences per 100 chars.

    score(lang) = 100 * Σ_t count(t, text) / length(text); prediction is the
    argmax, 'und' when the best score < ``min_score`` (not enough evidence).
    Deterministic: ties break alphabetically. Pure built-ins — the counts are
    regexp-free ``split``-based occurrence counts, JVM-side.
    """
    c = F.col(text) if isinstance(text, str) else text
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    n = F.length(padded)

    def occurrences(t: str) -> Column:
        # count of substring t = (len(s) - len(remove(s, t))) / len(t)
        return (n - F.length(F.replace(padded, F.lit(t), F.lit("")))) / len(t)

    scores = {
        lang: (sum(occurrences(t) for t in tris) * F.lit(100.0) / n)
        for lang, tris in TRIGRAM_PROFILES.items()
    }
    langs = sorted(scores)
    best = F.greatest(*[scores[l] for l in langs])
    pred = F.lit("und")
    for l in reversed(langs):
        pred = F.when((best >= min_score) & (scores[l] == best), F.lit(l)).otherwise(pred)
    return pred
