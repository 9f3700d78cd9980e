"""Compact public wordlists for the dictionary-vote language filter.

The reference loads German/French/English dictionaries plus loan-word
lists (``loadVocab``, clean.pl:543-623) from its ``dic/`` directory
(german.dic 276 words, french-all.dic 874, english-all.dic ~4.2k). The
lists below are independently assembled standard function/common-word
inventories at the same order of magnitude (DE ≳ 2.2k, FR ≳ 2.8k,
EN ≳ 2k after the shared-word fold; the EN side is deliberately kept
thick enough that every FR/DE surface that is also a real English word
classifies as *shared*, never foreign) — function words dominate every
natural-language text, so this carries the vote's signal. Words that are
native in BOTH English and German/French (table, train, hand, figure, …)
appear in both lists and therefore count as *shared* votes, the same
mechanism as the reference's ``sharedwords.txt``. A small English
loan-phrase list covers phrases whose lead words collide with
French/German function words — the case ``matchPhrase``
(clean.pl:680-702) exists for.

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
    act actions add added addition additional address advance advantage
    age agree ahead air allow allowed almost alone already although
    always amount anyone anything appear applied apply approaches
    argument arm arms art ask asked available average avoid away back
    bad balance base basic basis become becomes becoming begin
    beginning behind believe benefit benefits best big bit black blue
    board body book books bottom box break bring broad brought build
    built business call called calls came capacity card care carried
    carry cases cause causes center central certainly chain chance
    changed changes chart chat check choice choose chosen circle cite
    cited city claim clear clearly close closed closer com come comes
    coming common commonly company compare compared complete completely
    compute computing concern condition connected connection consider
    considered consists contain contains content contents contrast
    copy core correct corresponding count course court cover covered
    create created cut date day days deal decide decided deep define
    defined degree demand depend depends derive derived describe
    described despite detail detailed details determine determined
    develop developed difference differences difficult direct directly
    discuss discussed done double draw drawn due early easily easy
    edge edges effort either element elements else end ends enough
    ensure entire entirely equal equation especially essential
    establish established even evenly ever every everything exactly
    except exist existing exists expect expected explain explained
    express expressed extra face fact factor factors fail fall falls
    far fear fee feed feel fewer figure figures file files final
    finally find fit five fixed focus follow followed following force
    forces form formed forms forward four free front full fully gain
    game games gap gave generally generate generated getting give
    gives giving go goal goes going gone got green ground group
    grouped groups grow growing growth hand handle hands happen
    happens hard having head heavy held help helps hence higher
    highest highly hold holds home hope hour hours house however huge
    human idea ideas identify identity ignore immediately importance
    important improve include included includes including increase
    increased increasing indeed independent indicate indicates
    individual initial instead interest interesting involve involved
    item items itself job join joined keep keeping keeps kept kind
    kinds know known lack land language larger largest later lead
    leading leads learn learned least leave led left length let
    letter letters life light likely limit limits list listed lists
    literature little live lives long longer look looked looking
    loss lost lot lower main mainly maintain major majority makes
    making manner map maps mark market material materials matter
    mean meaning means meant measured meet member members mention
    mentioned method middle mind minimum minor minute minutes miss
    missing mode moment money month months moreover morning move
    moved moves moving name named names namely natural naturally
    nature near nearly necessary need needed needs neither net
    nevertheless night nine normal normally note noted notes nothing
    notice number numbers object objective observe observed obtain
    obtained obviously occur occurs offer offered offers office often
    old older ones open opened opening operate option options orange
    organization original originally otherwise outcome output outside
    overall pain pair pairs part partial particular particularly
    parts party pass passed past path paths pay people perhaps period
    person physical pick piece pieces place placed places plan plane
    plans play played point pointed police policy poor popular
    position positions positive possibly potential practically
    predict present presented presents press pressure pretty previous
    previously primary prior private probably produce produced
    product production products proper properly propose proposed
    prove proved provide provided provides providing public published
    purpose put quarter quite range rates reach reached read reading
    ready reason reasons receive received recent recently record
    records red reduce reduced refer reference references referred
    regard regarding related relationship relative relatively release
    relevant remain remaining remains remove removed replace replaced
    represent represented represents require required requirement
    requirements requires respect respectively rest return returns
    right rise road role room rough roughly round rule run running
    runs sale says scene school science sea season seat see seen
    seem seems select selected sense sent separate series serve
    served serves setting seven shall shape shared sharing short
    shorter show showed showing shown shows side sides sign
    significant significantly similar similarly simply site sites
    situation size sizes slightly slow small smaller smallest sort
    sound source sources space spaces specific specifically spent
    spread squares stage stages stand standards start started
    starting starts statement states station status stay step steps
    still stop stopped store stored straight strength strong
    strongly student students style subject subjects successful
    suggest suggested suitable sum summer supply supported suppose
    sure surface table tables take taken takes taking talk target
    targets task tasks team tell ten term terms thing things think
    third thought thousand threshold thresholds throughout today
    together told took top total totally touch toward town track
    trade traditional traffic train trained treat treated treatment
    triangle tried true truly trust truth try turn turned turns
    typical typically understand understanding understood unit units
    unless unlike usually valid variety various vary version view
    impossible
    views volume wait walk wall wanted watch water week weeks weight
    went white whole wide widely win window winter wish word words
    work worked working works write written wrong year years yellow
    yet young
    """.split()
)

# Round-5 thickening (ADVICE r4): the DE/FR dictionaries grew past 2k
# surface forms while EN stayed at ~1.5k, so English cognates and
# homographs of the new foreign surfaces (constant, porter, hotel,
# million, change, force, ...) voted FOREIGN instead of SHARED and plain
# English sentences flagged French. The reference avoids this by loading
# a ~4.2k-word english dictionary (clean.pl:543-623) so cognates land in
# `shared`. This extension restores that balance: (a) every FR/DE-list
# surface that is also a real common English word, (b) a general
# common-English inventory (everyday nouns/verbs/adjectives + key
# inflections) at the reference's order of magnitude.
_EN_EXTRA = """
    accident assurance bureau car cave cent charge charged charges
    cinema client clients competition concert constant constants
    continue continued continues continuing cousin cousins credit
    crime crimes critique dire distinct edition editions equations
    fort forte fruit fruits genre grace grand hotel hotels impose
    imposed imposes indirect invite invited invites journal journals
    lit locale machines mains match matches million millions organise
    organised patron pays pendant performances phrase phrases physique
    plus port ports porter pose posed poses pour poured pours prepare
    prepared prepares presentation presentations principal prison
    rapport refuse refused refuses regional religion reserve reserved
    reserves robe robes roman rouge route routes sales seize seized
    sentiment sentiments six son sons spectacle sport sports suite
    suites theatre theatres tire tired tires touches trait traits
    transport transported transports tribunal varied varies vent vents
    village villages visit visited visiting visits voyage voyages
    ball bald bank fallen gut hat hut man mantel museum music nun oft
    patient pro regal rock sang tag tee teller tier tot wand war warm
    wind
    parameter parameters bag bags weather
    january february march april may june july august september
    october november december monday tuesday wednesday thursday friday
    saturday sunday spring autumn north south east west
    mother father brother sister daughter uncle aunt grandmother
    grandfather wife husband baby child children friend friends
    family families people person neighbor guest guests
    door floor roof garden kitchen bathroom bedroom room rooms street
    streets road roads river lake mountain mountains forest tree
    flower flowers dog cat bird birds fish horse animal animals
    morning evening afternoon tonight tomorrow yesterday hour minutes
    money price prices store shop shops market hospital doctor nurse
    teacher lawyer church god king queen president government country
    countries nation national international city cities town towns
    building factory farm office works company companies business
    bread milk cheese coffee tea beer wine water juice bottle glasses
    cup plate knife fork spoon chair bed lamp mirror carpet curtain
    ceiling stairs key keys lock bus plane airplane airport ticket
    tickets travel trip holiday holidays vacation luggage suitcase
    salary tax taxes bill bills account insurance medicine disease
    health healthy fever cough injury blood heart eye eyes ear ears
    nose mouth tooth teeth leg legs foot feet finger fingers hair
    skin shoulder stomach body
    dinner lunch breakfast meal meat chicken egg eggs butter sugar
    salt pepper rice soup cake apple apples pear banana lemon grape
    strawberry cherry potato potatoes tomato onion vegetable
    vegetables chocolate honey shirt shoes dress coat jacket skirt
    hat socks gloves belt glasses ring necklace
    dance danced dancing sing singing swim swimming ride riding drive
    driving drove fly flying flew walked walking ran eat eating ate
    drink drinking drank sleep sleeping slept wake woke wear wearing
    wore buy buying bought sell selling sold paid spend spending cook
    cooking cleaning wash washing closing began begun finish finished
    stopping waited listen listened hear heard smell taste laugh
    laughed cry cried smile smiled speak speaking spoke spoken said
    saying tells telling asks teach teaching taught studied forgot
    forget forgotten remember remembered send sending sent push pull
    throw threw catch caught broke broken repair repaired destroy
    destroyed won lose losing fight fought die died dead death born
    grew grown lived living stayed arrive arrived arriving leaving
    entered enter returned visit song songs movie movies picture
    pictures photo photos newspaper magazine island bridge tower
    castle war peace love loved hate hated happy sad angry afraid
    beautiful ugly tall thin thick fat hot cold warm cool dry wet
    clean dirty loud quiet empty soft sweet sour bitter fresh cheap
    expensive rich poor safe dangerous strange famous foreign modern
    ancient
    """.split()

EN_WORDS = frozenset(set(EN_WORDS) | set(_EN_EXTRA))

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
    ich du er es wir ihr mich dich ihn uns euch mir dir ihm ihnen
    mein meine meinem meinen meiner meines deine deinem deinen deiner
    unser unsere unserem unseren unserer euer eure wem wen wer wessen
    wie wo wohin woher wann weshalb wieso ja nein vielleicht gern gerne
    morgen gestern abend nacht tag tage jahr jahre jahren monat monate
    woche wochen stunde stunden mal leben welt land laender stadt
    staedte haus haeuser tuer fenster zimmer tisch stuhl wasser feuer
    erde himmel meer berg berge fluss weg wege strasse strassen auto
    zug geld preis preise schule schulen universitaet student
    studenten lehrer seite seiten wort worte woerter satz saetze brief
    briefe zahl zahlen geschichte natur tier tiere hund katze vogel
    fisch baum baeume blume blumen frucht fruechte brot wein milch
    farbe farben weiss schwarz rot blau gruen gelb koerper kopf auge
    augen hand haende fuss fuesse arm arme bein beine herz geist seele
    grund gruende gefuehl gefuehle liebe freundschaft familie vater
    mutter bruder schwester sohn tochter onkel tante freund freunde
    leute volk gesellschaft staat regierung gesetz gesetze recht
    rechte krieg frieden kraft kraefte macht ordnung platz plaetze
    anfang ende mitte seite haelfte teile gruppe gruppen anzahl frage
    fragen antwort antworten ursache wirkung mittel weise art arten
    stueck stelle stellen lage zustand zustaende richtung bereich
    bereiche punkt punkte stufe stufen grad gewicht groesse laenge
    breite hoehe tiefe flaeche raum raeume form formen linie linien
    kreis quadrat dreieck gut boese schoen haesslich jung alt lang
    kurz breit schmal stark schwach leichte schwer voll leer reich
    arm teuer billig schwierig moeglich unmoeglich noetig nuetzlich
    wichtig wichtige wichtigen wahr falsch richtig genaue klar dunkel
    sauber schmutzig kalt warm heiss trocken nass weich hart frei
    naechste naechsten verschieden verschiedene verschiedenen
    besonders ebenfalls allerdings trotzdem dennoch inzwischen
    schliesslich uebrigens beinahe ungefaehr ziemlich voellig
    durchaus keineswegs
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
    suis sommes etes etais etions etiez serai seras sera serons serez
    seront serait serions seraient sois soyons soyez soient ai avons
    avez ont avais avions aviez aient aura aurai auras aurons aurez
    auront aurais aurions auriez fais faisons faisait faisaient font
    fera feront ferait ferons vais vas va allons allez vont allait
    allaient ira iront irait peux pouvons pouvez pouvait pouvaient
    pourra pourront pourrait pourraient veux veut voulons voulez
    veulent voulait voudra voudrait devons devez devait devaient devra
    devrait sais sait savons savez savent savait saura viens vient
    venons venez viennent venait viendra prend prends prenons prenez
    prennent prenait prendra met mets mettons mettez mettent mettait
    mettra dis disons dites disent disait dira donne donnes donnons
    donnez donnent donnait donnera trouve trouvent trouvait trouvera
    parle parlent parlait parlera passent passait passera portent
    portait restent restait restera semble semblent semblait pense
    pensent pensait laisse laissent laissait rendent rendait crois
    croit croient croyait demandent demandait tient tiennent tenait
    suivent suivait devient deviennent devenait comprend comprennent
    comprenait permet permettent permettait montre montrent montrait
    proposent proposait presentent presentait utilisent utilisait
    homme femme enfant enfants jour jours nuit annee annees mois
    semaine semaines heure fois monde vie mort pays ville villes
    village maison porte fenetre chambre table chaise lit eau feu
    terre ciel montagne riviere route chemin voiture train avion
    bateau argent prix emploi ecole universite eleve eleves etudiant
    etudiants professeur maitre livres mot phrase lettre lettres
    chiffre chiffres histoire geographie nombre science animaux chien
    chat oiseau oiseaux poisson arbre arbres fleur fleurs fruits pain
    vin lait viande legumes couleur couleurs blanc blanche noir noire
    rouge bleu vert jaune corps tete yeux oeil main mains pied pieds
    bras jambe jambes coeur esprit ame idee raison sentiment
    sentiments amour amitie famille pere mere frere soeur fils fille
    filles oncle tante cousin voisin ami amis gens peuple societe etat
    gouvernement loi lois droit droits guerre paix pouvoir ordre place
    places rue rues quartier milieu cote bord debut commencement
    moitie partie ensemble groupe groupes reponse reponses cause
    causes effet effets resultat moyen moyens maniere manieres facon
    facons sorte sortes genre espece especes niveau niveaux degre
    poids taille longueur largeur hauteur profondeur surface volume
    forme formes figure lignes cercle carre triangle mauvais mauvaise
    beau belle joli jolie jeune vieux vieille longue court courte
    large etroit etroite fort forte faible legere lourd lourde plein
    pleine vide riche pauvre cher chere facile difficile impossible
    necessaire utile inutile importante importants importantes vrai
    vraie faux fausse exacte clair claire sombre sale froid froide
    chaud chaude seche humide doux douce dur dure libre derniers
    dernieres prochain prochaine diverses notamment egalement
    particulierement generalement actuellement reellement vraiment
    simplement largement fortement faiblement directement rapidement
    lentement facilement difficilement completement entierement
    totalement partiellement principalement essentiellement surtout
    davantage desormais neanmoins toutefois
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


# ---------------------------------------------------------------------------
# Round-4 thickening: the reference loads full dictionaries from dic/
# (clean.pl:543-623); the round-3 lists (~700-800 words/language) under-vote
# on real text. The blocks below extend each language to >2k real surface
# forms: explicit inventories of everyday nouns / irregular-verb paradigms /
# adverbs, plus systematically generated REGULAR inflections (German weak-verb
# conjugation and adjective declension; French first-group -er conjugation and
# regular adjective agreement) — all real word forms, restricted to paradigms
# that are fully regular so generation cannot invent a non-word. Same ASCII
# conventions as above (DE umlaut -> ae/oe/ue, ss; FR accents stripped).
# ---------------------------------------------------------------------------

# German weak (regular) verb stems: conjugates stem+en/t/te/ten and the
# participle ge+stem+t (no ge- for inseparable prefixes be-/ver-/er-/ent-/
# zer-/emp-/miss- and -ieren verbs, per standard grammar).
_DE_WEAK_STEMS = """
    mach such frag sag leb lieb spiel kauf bau zeig stell setz leg brauch
    dank hoff woll hol fehl feier fuehl fuehr gruend klaer lach
    lern mein merk nutz pack plan prob rechn red reis schau schick sorg
    spar stoer tanz teil wart wechsel weck wirk wohn zahl zweifel
    bearbeit beantwort bedeut begruend behandel beherrsch belast beleg
    bemerk benoetig beobacht bericht beruecksichtig beschaeftig beschraenk
    bestaetig besuch betracht betreu beurteil bewaehr bewert bezeichn
    erfolg erfuell ergaenz erhoeh erklaer erlaub erleichter ermittel
    ermoeglich eroeffn erreich ersetz erwart erwaehn erzeug
    verursach verbesser verdeutlich vereinfach verfolg
    verhinder verknuepf verlang verlager verringer versorg verteil
    verwalt verwend verzicht
    entwickel entfern entlast
""".split()
_DE_NO_GE_PREFIXES = ("be", "ver", "er", "ent", "zer", "emp", "miss", "ge")


def _gen_de_weak(stems):
    out = set()
    for s in stems:
        # e-insertion before -t/-te for dental and syllabic-n stems
        # (wartet, redete, rechnet, bedeutet) — standard weak conjugation
        t = s + ("e" if s.endswith(("d", "t", "chn", "ffn", "ckn", "gn")) else "")
        # -el/-er stems take a bare -n infinitive (wechseln, verbessern)
        inf = s + ("n" if s.endswith(("el", "er")) else "en")
        out.update({inf, t + "t", t + "te", t + "ten"})
        if s.endswith("ier") or s.startswith(_DE_NO_GE_PREFIXES):
            out.add(t + "t")
        else:
            out.add("ge" + t + "t")
    return out


# German base adjectives whose declension base+e / base+en is fully regular.
_DE_ADJ_BASES = """
    schnell langsam ruhig laut leise froh traurig gluecklich zufrieden
    muede krank gesund bekannt unbekannt beruehmt fremd eigen offen
    einzeln oeffentlich privat staatlich wirtschaftlich politisch sozial
    kulturell historisch technisch wissenschaftlich theoretisch praktisch
    mathematisch physikalisch chemisch biologisch elektrisch elektronisch
    mechanisch optisch thermisch dynamisch statisch manuell lokal global
    zentral regional national international europaeisch deutsch englisch
    franzoesisch modern klassisch typisch kritisch logisch numerisch
    formal experimentell industriell strukturell funktional optimal
    minimal maximal normal formell speziell generell aktuell virtuell
    digital komplex konkret abstrakt direkt indirekt exakt korrekt
    effizient intelligent relevant konstant interessant wichtig
    vollstaendig unvollstaendig abhaengig unabhaengig zuverlaessig
    leistungsfaehig notwendig zukuenftig bisherig heutig jeweilig
    zahlreich erfolgreich umfangreich aehnlich unterschiedlich
    zusaetzlich wesentlich urspruenglich ausfuehrlich gewoehnlich
    persoenlich taeglich jaehrlich monatlich woechentlich endlich
    grundlegend entsprechend folgend steigend wachsend
    zunehmend umfassend bestehend vorliegend geeignet verbreitet
""".split()


def _gen_de_adj(bases):
    out = set()
    for b in bases:
        out.update({b, b + "e", b + "en", b + "er"})
    return out


_DE_EXTRA = """
    mann maenner frau frauen kind kinder junge maedchen herr dame mensch
    menschen person personen arzt aerzte schueler lehrerin patient
    mittag nachmittag mitternacht januar februar maerz april juni juli
    august september oktober november dezember montag dienstag mittwoch
    donnerstag freitag samstag sonntag sommer fruehling herbst jahreszeit
    wetter regen schnee wind sonne mond stern sterne wolke wolken nebel
    sturm gewitter blitz donner kueche bad garten hof keller dach wand
    waende boden decke treppe flur bett schrank regal lampe spiegel
    teppich kissen messer gabel loeffel teller tasse glas glaeser flasche
    topf pfanne fruehstueck mittagessen abendessen speise speisen gericht
    gerichte suppe salat fleisch gemuese obst apfel aepfel birne banane
    orange zitrone traube erdbeere kirsche kartoffel kartoffeln tomate
    zwiebel butter kaese ei eier zucker salz pfeffer mehl reis nudeln
    kuchen keks schokolade honig marmelade saft kaffee tee bier kleidung
    hemd hose rock kleid mantel jacke schuh schuhe socke hut muetze
    handschuh guertel brille kette koffer tasche rucksack schluessel
    bahnhof flughafen hafen haltestelle fahrkarte fahrplan reise urlaub
    ferien hotel gast gaeste besuch arbeitgeber arbeitnehmer beruf berufe
    firma firmen betrieb fabrik buero werkstatt laden geschaeft markt
    kunde kunden verkaeufer chef kollege kollegen mitarbeiter gehalt lohn
    steuer steuern rechnung konto bank banken kredit versicherung
    krankenhaus apotheke medikament krankheit gesundheit schmerz
    schmerzen fieber husten schnupfen unfall verletzung polizei feuerwehr
    richter anwalt zeuge verbrechen dieb strafe gefaengnis kirche
    religion gott glaube musik lied lieder konzert theater film filme
    kino museum bibliothek zeitung zeitschrift roman gedicht kunst maler
    saenger schauspieler buehne publikum sport fussball mannschaft tor
    ball sieg niederlage wettkampf nummer summe viertel prozent sechs
    sieben acht neun elf dreizehn vierzehn fuenfzehn sechzehn siebzehn
    achtzehn neunzehn zwanzig dreissig vierzig fuenfzig sechzig siebzig
    achtzig neunzig hundert tausend million milliarde vierte fuenfte
    sechste siebte achte neunte zehnte gross klein neu gut schlecht
    schlechte schlechten hoch tief duenn dick hungrig durstig tot
    lebendig kompliziert gemeinsame gemeinsamen nationale internationale
    ausserdem jedenfalls keinesfalls ansonsten ebenso genauso sofort
    niemals irgendwann irgendwie irgendwo ueberall nirgendwo draussen
    drinnen links rechts geradeaus vorne hinten darunter dazwischen
    worauf wovon wozu womit wodurch weswegen
    gehen geht ging gegangen kommen kommt kam gekommen sehen sieht sah
    gesehen geben gibt gab gegeben nehmen nimmt nahm genommen finden
    fand gefunden dachte gedacht wusste gewusst sprechen spricht sprach
    gesprochen bringen bringt brachte gebracht halten haelt hielt
    gehalten fahren faehrt fuhr gefahren laufen laeuft lief gelaufen
    schreiben schreibt schrieb geschrieben lesen liest las gelesen essen
    isst gegessen trinken trinkt trank getrunken schlafen schlaeft
    schlief geschlafen beginnen begann begonnen bleiben bleibt blieb
    geblieben sterben stirbt starb gestorben tragen traegt trug getragen
    treffen trifft traf getroffen verlieren verliert verlor verloren
    gewinnen gewinnt gewann gewonnen ziehen zog gezogen fallen fiel
    gefallen steigen stieg gestiegen springen sprang gesprungen singen
    sang gesungen helfen hilft half geholfen rufen rief gerufen schlagen
    schlaegt schlug geschlagen waschen waescht wusch gewaschen vergisst
    vergass verstehen verstand verstanden erhalten erhielt entstand
    entstanden beschrieb beschrieben schliessen schloss geschlossen
    enthaelt enthielt bestand bestanden bezog bezogen ergab betraegt
    betrug gilt galt gegolten misst gemessen vergleicht verglich
    verglichen unterscheidet unterschied unterschieden analysieren
    analysiert analysierte implementieren implementiert implementierte
    definieren definiert definierte diskutieren diskutiert diskutierte
    praesentieren praesentiert realisieren realisiert basieren basiert
    existieren existiert funktionieren funktioniert informieren
    informiert organisieren organisiert reduzieren reduziert optimieren
    optimiert generieren generiert integrieren integriert modellieren
    modelliert simulieren simuliert spezifizieren spezifiziert
    klassifizieren klassifiziert identifizieren identifiziert
    charakterisieren charakterisiert
""".split()

DE_WORDS = frozenset(
    set(DE_WORDS)
    | set(_DE_EXTRA)
    | _gen_de_weak(_DE_WEAK_STEMS)
    | _gen_de_adj(_DE_ADJ_BASES)
)

# French first-group (-er) verb stems: stem+er/e/es/ent/ait/aient/era are
# all real conjugated forms for every fully regular -er verb (3sg/2sg/3pl
# present, 3sg/3pl imperfect, 3sg future); accents on the participle are
# stripped by the same ASCII convention, folding it onto the -e form.
_FR_ER_STEMS = """
    parl march chant dans jou travaill etudi cherch trouv donn port
    apport achet pay ecout regard aim ador detest prefer esper pens
    oubli appel demand pos expliqu racont montr enseign habit visit
    voyag nag gagn chang decid essay utilis employ cre developp amelior
    augment diminu calcul mesur compar evalu present propos appliqu
    realis prepar organis form inform
    accept accompagn ajout analys annonc arrang arriv assur attach
    attir avanc bloqu bris cess charg class collect combin commenc
    communiqu compos compt consider constat consult continu contribu
    control corrig coup declar decor demontr depass deplac design
    detaill determin discut dispos distribu divis effectu elabor elimin
    emport enregistr entour envoy estim evit exist exprim fabriqu
    facilit ferm figur fix fonctionn fond forc gard gener group
    identifi ignor illustr imagin import impos indiqu install integr
    interess interpret invit lanc limit livr manqu marqu mentionn
    modifi not observ occup opt particip pass permut plac prouv publi
    quitt rappel recherch reclam refus regl regroup rejet relev remarqu
    remplac rencontr renforc rentr repet represent reserv retourn
    retrouv separ signal signifi simplifi situ stock termin test tir
    touch tourn trait transform transport vari verifi visualis
""".split()


def _gen_fr_er(stems):
    out = set()
    for s in stems:
        base = s
        # e-insertion for -g stems before a/o endings (mangeait); only the
        # endings used here need it for -ait/-aient
        ge = s + "e" if s.endswith("g") else s
        out.update(
            {
                base + "er",
                base + "e",
                base + "es",
                base + "ent",
                ge + "ait",
                ge + "aient",
                base + "era",
            }
        )
    return out


# French adjectives with rule-describable agreement. Generation handles the
# regular classes: -e (invariant feminine), -el (doubles: -elle), -al
# (masculine plural -aux), -s/-x (invariant masculine plural), default
# (+e/+s/+es). Irregular-feminine adjectives (beau, vieux, bon, sec, …)
# stay as explicit forms in the base/extra lists.
_FR_ADJ_BASES = """
    grand petit fort lent rapide calme triste content fatigue malade
    vivant connu inconnu celebre propre simple seul commun social
    culturel historique scientifique theorique pratique mathematique
    physique chimique biologique electrique electronique mecanique
    optique thermique statique manuel local mondial central regional
    national francais anglais allemand espagnol moderne
    classique typique critique logique formel industriel structurel
    fonctionnel optimal minimal maximal normal special general actuel
    virtuel digital complexe concret abstrait direct indirect exact
    correct efficace intelligent pertinent constant interessant
    important complet incomplet different independant fiable puissant
    necessaire futur precedent present annuel mensuel
    semblable identique distinct precis global initial final
    principal essentiel reel original particulier recent profond
    large etroit leger lourd plein vide riche pauvre froid chaud
    humide dur libre ouvert haut court joli jeune
    vrai clair sombre sale
""".split()


def _gen_fr_adj(bases):
    out = set()
    for b in bases:
        if b.endswith("e"):
            out.update({b, b + "s"})
        elif b.endswith("el"):
            out.update({b, b + "le", b + "s", b + "les"})
        elif b.endswith("al"):
            out.update({b, b + "e", b + "es", b[:-2] + "aux"})
        elif b.endswith(("s", "x")):
            out.update({b, b + "e", b + "es"})
        else:
            out.update({b, b + "e", b + "s", b + "es"})
    return out


_FR_EXTRA = """
    matin soir midi minuit hier demain janvier fevrier mars avril juin
    juillet aout septembre octobre novembre decembre lundi mardi
    mercredi jeudi vendredi samedi dimanche printemps automne saison
    saisons pluie neige vent soleil lune etoile etoiles nuage nuages
    brouillard orage tonnerre cuisine salle bain jardin cour cave toit
    mur murs sol plafond escalier couloir armoire etagere lampe miroir
    tapis rideau coussin couteau fourchette cuillere assiette tasse
    verre verres bouteille casserole dejeuner diner repas plat plats
    soupe salade legume fruit pomme pommes poire banane citron raisin
    fraise cerise patate tomate oignon beurre fromage oeuf oeufs sucre
    sel poivre farine riz pates gateau biscuit chocolat miel confiture
    jus cafe biere vetement vetements chemise pantalon jupe robe
    manteau veste chaussure chaussures chaussette chapeau gant ceinture
    lunettes bague collier valise sac cle serrure gare aeroport port
    arret billet horaire voyage vacances hotel invite sejour patron
    employes metier metiers poste entreprise entreprises usine bureau
    atelier magasin marche marches client clients vendeur collegue
    collegues salaire impot impots facture compte banque banques credit
    assurance hopital pharmacie medicament maladie sante douleur
    douleurs fievre toux rhume accident blessure medecin infirmiere
    dentiste police pompier tribunal juge avocat temoin crime voleur
    peine prison eglise religion dieu foi priere musique chanson
    chansons concert theatre cinema musee bibliotheque journal roman
    poeme peinture peintre sculpteur chanteur acteur actrice scene
    public spectacle sport football match equipe balle ballon
    natation gymnastique victoire defaite competition numero somme
    quantite quart pourcentage huit dix onze douze treize quatorze
    quinze trente quarante cinquante soixante cent mille million
    milliard troisieme quatrieme cinquieme sixieme septieme huitieme
    neuvieme dixieme gros grosse bruyant silencieux heureux heureuse
    malheureux eveille affame saine etranger publique prive privee
    sociaux locaux dehors dedans dessus dessous gauche droite soudain
    bientot tard tot deja plutot autrefois rarement
    europeen europeenne europeens europeennes italien italienne
    quotidien quotidienne ancienne anciennes bas basse basses longue
    longues longs sec seche doux douce bon bons mauvaises vieil
    vieilles bel belles nouveau bonnes fausses
    aller venir voir savoir pouvoir vouloir devoir falloir prendre
    mettre dire lire ecrire boire manger dormir partir sortir entrer
    monter descendre tomber rester arriver chercher trouver donner
    porter apporter emporter acheter vendre payer couter ouvrir fermer
    commencer finir continuer arreter attendre ecouter entendre
    regarder sentir toucher gouter aimer adorer detester preferer
    esperer penser croire douter oublier rappeler appeler repondre
    demander poser expliquer raconter montrer apprendre enseigner
    etudier travailler jouer chanter danser courir marcher nager voler
    conduire voyager visiter habiter vivre mourir naitre grandir
    changer devenir choisir decider essayer reussir echouer gagner
    perdre suivre servir utiliser employer construire detruire creer
    produire developper ameliorer augmenter diminuer reduire calculer
    mesurer comparer analyser evaluer definir decrire presenter
    proposer introduire appliquer realiser obtenir permettre preparer
    organiser former informer
    allee eu pris mis dit lu ecrit bu mange dormi parti sorti monte
    descendu tombe arrive cherche donne porte achete vendu paye ouvert
    ferme commence fini arrete attendu ecoute entendu regarde senti
    touche aime espere pense cru oublie appele repondu demande pose
    explique raconte montre appris enseigne etudie travaille joue
    chante danse couru marche nage conduit voyage visite habite vecu
    devenu choisi decide essaye reussi gagne perdu suivi servi utilise
    employe construit detruit cree produit developpe ameliore augmente
    diminue reduit calcule mesure compare evalue defini decrit presente
    propose introduit applique realise obtenu permis prepare organise
    forme informe
""".split()

FR_WORDS = frozenset(
    set(FR_WORDS)
    | set(_FR_EXTRA)
    | _gen_fr_er(_FR_ER_STEMS)
    | _gen_fr_adj(_FR_ADJ_BASES)
)

# Derived dual-dialect vote sets (phrase/apostrophe handling lives only in
# the Python port; the SQL vote uses the plain set algebra both engines
# can replay identically)
DE_ONLY = frozenset(DE_WORDS - EN_WORDS)
DE_SHARED = frozenset(DE_WORDS & EN_WORDS)
FR_ONLY = frozenset(FR_WORDS - EN_WORDS)
FR_SHARED = frozenset(FR_WORDS & EN_WORDS)
