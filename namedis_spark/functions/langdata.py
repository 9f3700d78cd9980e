"""Compact public wordlists for the dictionary-vote language filter.

The reference loads full German/French/English dictionaries plus loan-word
lists (``loadVocab``, clean.pl:543-623) from its ``dic/`` directory. For a
title/transcript-scale filter a compact function-word + common-word
inventory carries virtually all of the vote's signal (function words
dominate every natural-language text), so the lists below are embedded:
~100 words per language of standard public function/common words, plus a
small English loan-phrase list whose lead words collide with French/German
function words — the case ``matchPhrase`` (clean.pl:680-702) exists for.

Flag bits follow the reference (clean.pl constants): a word can be NATIVE
in a language, a LOANWORD in English (part of an adopted phrase), and a
LOAN_PART_PHRASE marker on the lead words of multi-word loans.
"""

from __future__ import annotations

NATIVEWORD = 1
LOANWORD = 2
LOAN_PART_PHRASE = 4

EN_WORDS: frozenset[str] = frozenset(
    """
    a an and are as at be but by for from has have in is it its of on or
    that the this to was were will with we our using based via towards new
    approach method study analysis system model data learning networks
    network information processing algorithm algorithms application
    applications design theory models systems performance evaluation
    optimization control software web research paper results problem
    problems time high large scale real world case user users service
    services digital computing computer science language languages
    knowledge management social search image images video detection
    recognition classification clustering mining distributed parallel
    efficient dynamic adaptive neural deep machine
    """.split()
)

DE_WORDS: frozenset[str] = frozenset(
    """
    der die das und ist nicht mit von zu ein eine einer eines im am auf
    fuer ueber unter durch bei aus nach vor zwischen gegen ohne um als
    auch oder aber wenn dann noch nur schon sehr mehr kann wird werden
    wurde sind war waren haben hat hatte ihre seiner ihrem einem einen
    des dem den zur zum beim vom ins ans aufs sich man hier dort heute
    neue neuen neuer untersuchung entwicklung verfahren anwendung
    grundlagen einfuehrung beitrag bericht forschung wissenschaft technik
    rechner datenverarbeitung sprache systeme verteilte berechnung
    """.split()
)

FR_WORDS: frozenset[str] = frozenset(
    """
    le la les des et un une est dans pour par sur avec sans sous entre
    vers chez ce cette ces son sa ses leur leurs notre nos votre vos qui
    que quoi dont ou mais donc car ne pas plus moins tres bien peu tout
    tous toute toutes autre autres meme aussi comme ainsi alors depuis
    pendant apres avant contre selon parmi etude analyse methode approche
    systeme modele donnees apprentissage reseau reseaux traitement
    reconnaissance recherche application developpement evaluation
    nouvelle nouveaux theorie calcul langage informatique repartis
    """.split()
)

# English loan phrases whose lead words are native French/German function
# words — without phrase matching these words would vote "foreign" inside
# perfectly English text ("de facto standards", "a la carte services").
EN_LOAN_PHRASES: tuple[str, ...] = (
    "de facto",
    "de jure",
    "a la carte",
    "a la mode",
    "en route",
    "en masse",
    "vis a vis",
    "du jour",
    "a priori",
    "a posteriori",
)


def build_en_map() -> dict[str, int]:
    """English word → flag bits, with loan phrases folded in exactly as
    loadVocab does (clean.pl:596-618): every proper prefix's last word
    gets LOAN_PART_PHRASE, the full phrase gets LOANWORD."""
    m: dict[str, int] = {w: NATIVEWORD for w in EN_WORDS}
    for phrase in EN_LOAN_PHRASES:
        words = phrase.split()
        part = words[0]
        m[part] = m.get(part, 0) | LOAN_PART_PHRASE
        for w in words[1:]:
            part = part + " " + w
            m[part] = m.get(part, 0) | LOAN_PART_PHRASE
        m[phrase] = m.get(phrase, 0) | LOANWORD
    return m


# Derived dual-dialect vote sets (phrase/apostrophe handling lives only in
# the Python port; the SQL vote uses the plain set algebra both engines
# can replay identically)
DE_ONLY = frozenset(DE_WORDS - EN_WORDS)
DE_SHARED = frozenset(DE_WORDS & EN_WORDS)
FR_ONLY = frozenset(FR_WORDS - EN_WORDS)
FR_SHARED = frozenset(FR_WORDS & EN_WORDS)
