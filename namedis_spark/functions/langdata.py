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
    about above after again against all along also among any around
    because been before being below between both can could did do does
    down during each few first found further get given good great had
    her here him his how i if into just last less like made make many
    may me might more most much must my never next no none not now off
    once one only other others out over own per rather same second
    several she should since so some such than their them then there
    these they those three through thus too two under until up upon us
    very via want way well what when where which while who whose why
    within without would you your
    able access accuracy accurate achieve across action active activity
    advanced agent agents aided algorithmic allocation analyses
    analytical analyzing annotation answer answering architecture
    architectures area areas article artificial aspects assessment
    assisted association attention automated automatic automatically
    aware bandwidth behavior benchmark better beyond binary biological
    bound bounds brief building challenge challenges change channel
    channels chapter characterization class classes classifier
    classifiers cloud cluster clusters code codes coding cognitive
    collaborative collection combined combining comment communication
    communications comparative comparison complex complexity component
    components computation computational computations computed computers
    computes concept concepts conclusion conditions conference
    constraint constraints construction context continuous contribution
    cost counting coverage creating criteria cross current database
    databases dataset datasets decision decisions decoding deployment
    depth description descriptions detecting developing development
    device devices difference different digital dimension dimensional
    dimensions directions discovery discussion distance distribution
    distributions document documents domain domains driven edge
    editorial education effect effective effectiveness effects
    efficiency efficiently embedded embedding embeddings empirical
    enabled enabling encoding energy engine engineering enhanced
    enhancement environment environments error errors estimating
    estimation evaluating event events evidence evolution exact example
    examples experience experimental experiments expert exploration
    exploring extended extension extraction fast faster feature
    features field fields filter filtering finding fine flexible flow
    formal framework frameworks function functional functions fusion
    future fuzzy general generalized generating generation generative
    global graph graphs grid guided hardware heterogeneous heuristic
    hierarchical hybrid identification identifying impact implementation
    implementations improved improvement improving incremental inference
    innovative input instance integrated integrating integration
    intelligence intelligent interaction interactive interface
    interfaces internet introduction issue issues iterative joint kernel
    key label labeling labels latency layer layered level levels
    lightweight limited linear local localization location logic low
    lower matching matrix measure measurement measures measuring
    mechanism mechanisms memory message messages metric metrics mobile
    modeling modular monitoring multi multiple multimedia node nodes
    noise note novel object objects online open operation operations
    operator operators optimal optimized order oriented overview
    packet page pages pattern patterns perspective perspectives phase
    planning platform power practical practice precision predicting
    prediction predictive preliminary preface print privacy
    probabilistic procedure procedures process processes processor
    processors program programming programs progress project proof
    properties property proposal protocol protocols prototype quality
    quantum query querying question random ranking rate reasoning
    reduction region regions relation relational relations reliability
    reliable report representation representations resource resources
    response retrieval review robust routing rule rules sampling scalable
    scaling scheduling schema scheme schemes secure security segmentation
    selection semantic semantics sensing sensor sensors sequence
    sequences sequential session set sets signal signals similarity
    simple simulation simulations single smart solution solutions
    solving sparse spatial special spectrum speech speed stability
    stable standard state statistical storage strategies strategy
    stream streaming streams structure structured structures studies
    summary supervised support survey symbolic synthesis technical
    technique techniques technologies technology temporal test testing
    tests text theoretic theoretical tool tools topic topics tracking
    training transfer transform transformation translation transmission
    tree trees trends tutorial type types unified unique unsupervised
    update upper usage validation value values variable variables
    verification version virtual vision visual visualization weighted
    wireless workshop
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
    ab alle allen aller alles allgemeine allgemeinen also alte alten
    andere anderen anderer anderes anhand auswahl bald beide beiden
    beispiel beispiele bereits besondere besonderen besonderer bessere
    besseren bestimmte bestimmten bisher dabei dadurch dafuer dagegen
    daher damit danach daneben dann darauf daraus darin darstellung
    darueber dass davon dazu denen denn deren derer deshalb dessen
    deutlich deutsche deutschen diese diesem diesen dieser dieses doch
    dorthin drei dritte dritten durchfuehrung eigene eigenen eigener
    einfach einfache einfachen einige einigen einiger einmal einsatz
    erste ersten erster erstes etwa etwas fall falls fast folgende
    folgenden frueher fuenf ganz ganze ganzen gegenueber gemeinsam
    genau gute guten gibt gleich gleiche gleichen grosse grossen
    grosser heraus hin hinter hohe hohen hoher immer indem innerhalb
    insbesondere jede jedem jeden jeder jedes jedoch jene jetzt kaum
    keine keinem keinen keiner kleine kleinen kleiner koennen koennte
    konnte kurz lange laesst lassen leicht letzte letzten liegt machen
    macht mittels moegliche moeglichen muessen muss nahe neben nicht
    nichts niedrig nun oben obwohl oft ohne paar pro rund seit selbst
    seine seinem seinen
    sollen sollte somit sondern sowie sowohl spaeter stark stehen steht
    stets teil teilweise unten unter untereinander viel viele vielen
    vieler vier vollstaendig waehrend warum weder weil weit weitere
    weiteren weiterer welche welchem welchen welcher welches wenig
    wenige weniger wieder wurden zehn zeigen zeigt zuerst zugleich
    zunaechst zusammen zwei zweite zweiten zwoelf
    abbildung ablauf abschnitt algorithmen algorithmus analyse analysen
    anforderungen angewandte ansaetze ansatz anwendungen arbeit arbeiten
    architektur architekturen aufbau aufgabe aufgaben auswertung
    automatische automatischen bearbeitung bedeutung begriff begriffe
    benutzer beschreibung betrachtung betrieb bewertung beziehung
    beziehungen bild bilder bildverarbeitung buch daten datenbank
    datenbanken datenmodell datenstrukturen dienste eigenschaften
    einfluss ergebnis ergebnisse erkennung erweiterung entwurf
    fallstudie fehler folgerungen funktion funktionen gestaltung
    graphen grundlage hilfe implementierung informatik information
    informationen informationssysteme integration kapitel klassen
    klassifikation kommunikation komplexitaet konzept konzepte
    konzeption kontrolle lernen literatur loesung loesungen management
    menge mengen methode methoden modell modelle modellierung netz
    netze netzwerk netzwerke nutzung objekte optimierung parallele
    parallelen praxis probleme problemen programme programmierung
    projekt prozess prozesse pruefung qualitaet realisierung rechnern
    regelung schnittstelle sicherheit simulation software speicher
    sprachen steuerung strukturen studie techniken technologie
    technologien theorie umgebung umsetzung unterstuetzung
    untersuchungen verarbeitung verbesserung vergleich verhalten
    verfahrens verteilten verwaltung verwendung werkzeug werkzeuge
    wissen zeit zukunft zusammenfassung zuverlaessigkeit
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
    afin ailleurs ancien anciens assez aucun aucune aujourd aupres
    auquel auraient aurait auxquels avaient avait ayant beaucoup bonne
    bonnes celle celles celui cependant certain certaine certaines
    certains ceux chacun chacune chaque cinq combien comment dela
    derriere deux devant doit doivent durant elle elles encore enfin
    ensuite entier envers environ etaient etait etant ete etre eux
    faire fait faite faites faut grace grand grande grandes grands
    haut haute hautes jamais jusqu laquelle lequel lesquelles lesquels
    lors lorsque lui maintenant malgre meilleur meilleure mieux moindre
    neuf nombreux nombreuses nouvel nouvelles nulle autrement parfois
    partout pendant petit petite petites petits peut peuvent plusieurs
    pourquoi pourtant premier premiere premieres premiers pres presque
    puis quand quatre quel quelle quelles quelques quels seize
    sept seule seulement six soit sont souvent suite telle telles tels
    toujours trois trop vingt voici voila
    algorithme algorithmes amelioration applications appliquee
    appliquees architecture architectures automatique automatiques
    bases calculs cas chapitre classification codage commande
    comparaison complexite comportement conception connaissance
    connaissances construction contribution controle cours definition
    demonstration detection deuxieme distribue distribuee distribuees
    distribues dynamique dynamiques edition environnement environnements
    equations espace etudes exemple exemples extraction fonction
    fonctions formelle generation gestion graphe graphes images
    implantation integration intelligence interface interfaces jeux
    langages livre logiciel logiciels logique machines mesure mesures
    methodes mise modeles modelisation mots numerique numeriques objets
    optimisation ordinateur ordinateurs outil outils parallele
    paralleles parole partie performances presentation probleme
    problemes programmation projet proprietes qualite rapport
    realisation representation resultats revue robotique securite
    semantique signaux simulation solution solutions statistique
    statistiques structures synthese techniques technologies tel
    temporelle theoreme traduction travail travaux utilisant
    utilisation valeurs vision
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
