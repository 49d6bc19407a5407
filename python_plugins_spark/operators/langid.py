"""Character-trigram language identification — the real lang-id.

The stopword heuristic (``operators/text.py:lang_id``) only sees
documents that happen to contain one of 8 function words per language;
production crawl pipelines use character n-gram statistics (Cavnar &
Trenkle 1994, "N-Gram-Based Text Categorization" — the textcat /
langid.py family), which classify from the distribution of EVERY
character window, so morphology alone ("-ción", "sch", "eau") decides
even when no stopword appears.

Pipeline position (mirrors ``script_detect_docs``): branch on dominant
SCRIPT first — Cyrillic/Greek/Han/kana/Hangul/Arabic/Devanagari/
Hebrew/Thai-dominant text routes straight to the script-level verdict
(ru/el/zh/ja/ko/ar/hi/he/th; Han-dominant text with kana present is
kanji-bearing Japanese -> 'ja'; per-script trigram models downstream
are a data change, not a code change — see the Cyrillic and CJK
tiers), text with NO script character at all is 'unknown';
Latin-dominant text is scored against
eight per-language trigram tables (en/de/fr/es/it/pt/nl/sv), with a
per-trigram confidence MARGIN (best minus second-best log-prob) for
callers that threshold before trusting the verdict. Scoring is multinomial
naive Bayes with add-one smoothing over the union vocabulary:

    score(lang) = sum over doc trigrams tg of ln P(tg | lang)
    P(tg | lang) = (c_lang(tg) + 1) / (total_lang + |V| + 1)

where c_lang are trigram counts over that language's profile corpus,
total_lang their sum, V the union of the per-language top-K vocabularies.
Out-of-vocabulary trigrams get the same formula with c = 0 — one shared
OOV constant per language, so the profile map only stores c > 0 entries.

HONESTY CONTRACT (same as the codecs): no fabricated model weights.
The profiles are derived AT IMPORT TIME by :func:`build_profiles` from
the in-repo fixture corpora below (original prose, ~120 words per
language) — the real algorithm on real text, reproducible by reading
this file. Swapping in full-size profiles (e.g. derived from a public
corpus) is a data change, not a code change.

100 TB shape: the profile tables are tiny (|V| ~ a few hundred), so
they ship as plan LITERALS — one combined ``map<string, array<double>>``
(trigram -> per-language log-probs, one lookup per trigram instead of
one per trigram per language) folded over each document's trigram
array with ``aggregate``/``zip_with``. Pure JVM expressions: zero
Python, zero explode, ZERO SHUFFLES — a narrow map over the scan, and
the whole corpus-sized cost is embarrassingly parallel. (The alternative
— explode trigrams + broadcast-join the profile relation — shuffles
O(corpus characters) rows; the literal-map fold shuffles nothing.)

The DuckDB oracle replays the identical math: same normalization, same
trigram windows, same MAP literal, same LEFT fold — sequential
double-precision addition in the same element order is bit-identical
across engines, so scores (rounded) hash-match, not just the argmax.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd  # noqa: F401 — resolves postponed type hints in pandas UDFs
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from python_plugins_spark.session import stage_checkpoint


# Original prose fixture corpora (see module docstring: these exist to
# make the profile derivation honest and self-contained, not to model
# the full languages; ~120 words each, written for this repo).
FIXTURE_CORPORA: dict[str, str] = {
    "en": (
        "The old library stood at the corner of the square, and every "
        "morning the same readers climbed its worn stone steps. They came "
        "for the quiet more than for the books, although the shelves held "
        "almost everything a curious mind could want. Outside, the market "
        "traders shouted about fresh bread and winter apples, but inside "
        "there was only the sound of turning pages. When the rain arrived "
        "in the afternoon, students gathered near the tall windows and "
        "watched the water run along the street. The librarian knew most "
        "of them by name, and she would set aside the new arrivals for "
        "those who asked. Nothing about the place was modern, yet nobody "
        "wished to change it, because it worked the way a town should "
        "work, slowly and together. "
        # technical register — Latinate English would otherwise score
        # closer to French at the trigram level
        "Modern computing systems process information through layered "
        "abstractions. A distributed query engine partitions massive "
        "datasets across many machines, applying filters and "
        "aggregations in parallel before combining partial results. "
        "Researchers measure throughput and latency carefully, because "
        "performance depends on data movement more than raw "
        "computation. Efficient algorithms minimize network traffic, "
        "exploit locality, and schedule work dynamically. Documentation "
        "explains configuration options, typical failure modes, and "
        "recommended monitoring practices for production deployments."
    ),
    "de": (
        "Der alte Bahnhof lag am Rand der kleinen Stadt, und jeden Morgen "
        "warteten die gleichen Leute auf den ersten Zug. Sie sprachen "
        "über das Wetter, über die Arbeit und über die Nachbarn, während "
        "der Nebel langsam über die Gleise zog. Im Winter brachte der "
        "Wind den Schnee durch die offene Halle, und der Mann am Schalter "
        "trank seinen Kaffee und schaute auf die Uhr. Die Züge waren "
        "selten pünktlich, aber niemand beschwerte sich wirklich, denn "
        "man kannte einander seit vielen Jahren. Am Abend, wenn die "
        "Lichter über dem Bahnsteig brannten, wirkte alles ruhig und ein "
        "wenig müde. Die Kinder zählten die Wagen, die Alten erzählten "
        "ihre Geschichten, und die Stadt schlief früh ein. "
        "Moderne Rechensysteme verarbeiten Informationen über mehrere "
        "Abstraktionsschichten. Eine verteilte Abfrage zerlegt große "
        "Datenmengen auf viele Maschinen, wendet Filter und "
        "Aggregationen parallel an und kombiniert anschließend die "
        "Teilergebnisse. Forscher messen Durchsatz und Latenz sehr "
        "genau, weil die Leistung stärker von der Datenbewegung als von "
        "der reinen Berechnung abhängt. Effiziente Algorithmen "
        "verringern den Netzwerkverkehr, nutzen Lokalität aus und "
        "verteilen die Arbeit dynamisch. Die Dokumentation beschreibt "
        "Konfigurationsmöglichkeiten, typische Fehlerbilder und "
        "empfohlene Überwachungspraktiken für den Produktionsbetrieb."
    ),
    "fr": (
        "Le petit café ouvrait toujours avant le lever du soleil, et les "
        "premiers clients arrivaient avec les journaux sous le bras. On "
        "parlait de la pluie, des voisins et du prix des légumes, pendant "
        "que la machine remplissait les tasses une à une. La patronne "
        "connaissait les habitudes de chacun, et elle posait le pain "
        "chaud sur le comptoir sans attendre la commande. Vers midi, les "
        "ouvriers du chantier venaient chercher leur déjeuner, et la "
        "salle se remplissait de voix et de rires. Quand le soir tombait "
        "sur la place, les chaises restaient dehors encore une heure, "
        "puis la lumière s'éteignait doucement. Personne ne pressait "
        "jamais personne, car le temps du quartier n'était pas celui de "
        "la ville. "
        "Les systèmes informatiques modernes traitent l'information à "
        "travers plusieurs couches d'abstraction. Un moteur de requêtes "
        "distribué découpe les grands ensembles de données sur de "
        "nombreuses machines, applique les filtres et les agrégations "
        "en parallèle, puis combine les résultats partiels. Les "
        "chercheurs mesurent soigneusement le débit et la latence, car "
        "la performance dépend davantage du déplacement des données que "
        "du calcul lui-même. Des algorithmes efficaces réduisent le "
        "trafic réseau, exploitent la localité et répartissent le "
        "travail de manière dynamique. La documentation décrit les "
        "options de configuration, les pannes typiques et les pratiques "
        "de surveillance recommandées pour la production."
    ),
    "es": (
        "La plaza del pueblo se llenaba de gente cada domingo por la "
        "mañana, cuando las campanas llamaban desde la iglesia blanca. "
        "Los vendedores colocaban sus puestos de fruta, de pan y de "
        "flores, y los niños corrían entre las mesas persiguiendo a los "
        "perros. Las mujeres mayores hablaban del tiempo y de las "
        "cosechas, mientras los hombres discutían sobre el agua y los "
        "caminos. A mediodía llegaba el olor del arroz desde las casas, "
        "y todos volvían despacio a comer con la familia. Por la tarde, "
        "la sombra de los naranjos cubría los bancos de piedra, y la "
        "vida seguía su paso tranquilo. Nadie tenía prisa en aquel "
        "lugar, porque todo lo importante estaba siempre cerca. "
        "Los sistemas informáticos modernos procesan la información a "
        "través de varias capas de abstracción. Un motor de consultas "
        "distribuido divide los conjuntos grandes de datos entre muchas "
        "máquinas, aplica filtros y agregaciones en paralelo y luego "
        "combina los resultados parciales. Los investigadores miden el "
        "rendimiento y la latencia con mucho cuidado, porque el "
        "desempeño depende más del movimiento de datos que del cálculo "
        "puro. Los algoritmos eficientes reducen el tráfico de red, "
        "aprovechan la localidad y reparten el trabajo de forma "
        "dinámica. La documentación describe las opciones de "
        "configuración, los fallos típicos y las prácticas de "
        "supervisión recomendadas para producción."
    ),
    "it": (
        "Il vecchio mulino sorgeva lungo il fiume, poco fuori dal "
        "paese, e ogni mattina il fornaio arrivava presto per accendere "
        "il forno. Le strade erano strette e piene di voci, con le "
        "donne che parlavano davanti alle botteghe e i bambini che "
        "correvano verso la scuola. Durante l'estate, gli anziani "
        "sedevano all'ombra degli alberi nella piazza principale, "
        "raccontando storie dei raccolti e dei viaggi. Quando arrivava "
        "la sera, il profumo del pane e del caffè riempiva le vie, e "
        "tutti tornavano lentamente verso casa. Nessuno aveva fretta, "
        "perché la vita del paese seguiva da sempre lo stesso ritmo "
        "tranquillo. "
        "I sistemi informatici moderni elaborano le informazioni "
        "attraverso diversi livelli di astrazione. Un motore di "
        "interrogazione distribuito suddivide grandi insiemi di dati "
        "su molte macchine, applica filtri e aggregazioni in parallelo "
        "e poi combina i risultati parziali. I ricercatori misurano "
        "con attenzione la velocità e la latenza, perché le "
        "prestazioni dipendono più dal movimento dei dati che dal "
        "calcolo puro. Gli algoritmi efficienti riducono il traffico "
        "di rete, sfruttano la località e distribuiscono il lavoro in "
        "modo dinamico. La documentazione descrive le opzioni di "
        "configurazione, i guasti tipici e le pratiche di monitoraggio "
        "consigliate per la produzione."
    ),
    "pt": (
        "O mercado da vila abria cedo todas as manhãs, quando os "
        "pescadores voltavam do mar com as caixas cheias de peixe. As "
        "mulheres escolhiam fruta e legumes nas bancas, enquanto os "
        "homens conversavam sobre o tempo e as colheitas. Ao meio-dia, "
        "o cheiro do pão quente espalhava-se pelas ruas estreitas, e "
        "as crianças corriam para casa depois da escola. À tarde, os "
        "velhos sentavam-se à sombra das oliveiras, contando histórias "
        "antigas da aldeia. Quando a noite chegava, as luzes "
        "acendiam-se devagar e tudo ficava em silêncio. Ninguém tinha "
        "pressa naquele lugar, porque o importante estava sempre "
        "perto. "
        "Os sistemas informáticos modernos processam a informação "
        "através de várias camadas de abstração. Um motor de consultas "
        "distribuído divide grandes conjuntos de dados por muitas "
        "máquinas, aplica filtros e agregações em paralelo e depois "
        "combina os resultados parciais. Os investigadores medem "
        "cuidadosamente o desempenho e a latência, porque o custo "
        "depende mais do movimento dos dados do que do cálculo puro. "
        "Os algoritmos eficientes reduzem o tráfego de rede, "
        "aproveitam a localidade e repartem o trabalho de forma "
        "dinâmica. A documentação descreve as opções de configuração, "
        "as falhas típicas e as práticas de monitorização recomendadas "
        "para produção."
    ),
    "nl": (
        "De oude molen stond aan de rand van het dorp, vlak bij de "
        "rivier, en elke ochtend kwam de bakker vroeg om de oven aan "
        "te steken. De straten waren smal en vol stemmen, met vrouwen "
        "die voor de winkels praatten en kinderen die naar school "
        "renden. In de zomer zaten de ouderen in de schaduw van de "
        "bomen op het plein, en vertelden verhalen over de oogst en "
        "het weer. Wanneer de avond viel, vulde de geur van brood en "
        "koffie de straten, en iedereen liep langzaam terug naar "
        "huis. Niemand had haast, want het leven in het dorp volgde "
        "al jaren hetzelfde rustige ritme. "
        "Moderne computersystemen verwerken informatie via "
        "verschillende lagen van abstractie. Een gedistribueerde "
        "zoekmachine verdeelt grote hoeveelheden gegevens over veel "
        "machines, past filters en aggregaties parallel toe en "
        "combineert daarna de gedeeltelijke resultaten. Onderzoekers "
        "meten de snelheid en de vertraging zorgvuldig, omdat de "
        "prestaties meer afhangen van het verplaatsen van gegevens "
        "dan van de berekening zelf. Efficiënte algoritmen beperken "
        "het netwerkverkeer, benutten lokaliteit en verdelen het werk "
        "dynamisch. De documentatie beschrijft de instellingen, de "
        "gebruikelijke fouten en de aanbevolen controles voor "
        "productie."
    ),
    "sv": (
        "Den gamla kvarnen låg vid kanten av byn, nära floden, och "
        "varje morgon kom bagaren tidigt för att tända ugnen. "
        "Gatorna var smala och fulla av röster, med kvinnor som "
        "pratade utanför butikerna och barn som sprang mot skolan. "
        "På sommaren satt de gamla i skuggan av träden på torget och "
        "berättade historier om skörden och vädret. När kvällen kom "
        "fylldes gatorna av doften av bröd och kaffe, och alla gick "
        "långsamt hem igen. Ingen hade bråttom, eftersom livet i byn "
        "hade följt samma lugna rytm i många år. "
        "Moderna datorsystem behandlar information genom flera lager "
        "av abstraktion. En distribuerad frågemotor delar upp stora "
        "datamängder över många maskiner, tillämpar filter och "
        "aggregeringar parallellt och kombinerar sedan delresultaten. "
        "Forskare mäter hastigheten och fördröjningen noggrant, "
        "eftersom prestandan beror mer på datarörelser än på själva "
        "beräkningen. Effektiva algoritmer minskar nätverkstrafiken, "
        "utnyttjar lokalitet och fördelar arbetet dynamiskt. "
        "Dokumentationen beskriver inställningarna, de vanliga felen "
        "och de rekommenderade kontrollerna för produktion."
    ),
}

# Fixed language order: array slot, output column order, and the
# argmax tie-break priority (first wins) — same convention as lang_id.
LANGS = ("en", "de", "fr", "es", "it", "pt", "nl", "sv")

# Script routing (the script_detect_docs pipeline position): the Latin
# trigram model only runs on Latin-dominant text; other script
# dominance routes to the script-level verdict directly (a per-script
# trigram model downstream is a data change — the Cyrillic and CJK
# tiers below). EXPLICIT codepoint ranges (not \p{script} classes) so
# Java regex, RE2, and the Python reference count identically with
# zero engine subtleties. Dict order IS the tie-break priority (first
# wins among equals); a script must have AT LEAST ONE codepoint to
# win — text with no script characters at all (digits, punctuation)
# is 'unknown', never a Latin-trigram score (the old latin-tie-at-
# zero fallback confidently mislabeled every script outside the
# table; ~10-15% of the web is Arabic/Japanese/Korean/Hindi).
SCRIPT_RANGES = {
    "latin": "A-Za-zÀ-ɏ",
    "cyrillic": "Ѐ-ӿ",
    "greek": "Ͱ-Ͽ",
    "han": "一-鿿",          # U+4E00-9FFF CJK Unified Ideographs
    "kana": "぀-ヿ",          # U+3040-30FF hiragana + katakana
    "hangul": "가-힣",        # U+AC00-D7A3 Hangul syllables
    "arabic": "؀-ۿ",          # U+0600-06FF
    "devanagari": "ऀ-ॿ",      # U+0900-097F
    "hebrew": "֐-׿",          # U+0590-05FF
    "thai": "฀-๿",            # U+0E00-0E7F
}
# Script-level verdicts. Han is the one script shared by two major
# languages: kanji-bearing JAPANESE can be Han-dominant, so a
# Han-dominant text with ANY kana present resolves 'ja', pure Han
# 'zh' (the kana-presence disambiguation; the CJK trigram tier below
# separates the Han-only overlap by character choice).
SCRIPT_LANG = {
    "cyrillic": "ru",
    "greek": "el",
    "han": "zh",
    "kana": "ja",
    "hangul": "ko",
    "arabic": "ar",
    "devanagari": "hi",
    "hebrew": "he",
    "thai": "th",
}


def normalize(text: str) -> str:
    """The exact normalization both engines apply: lower, trim,
    collapse whitespace runs, pad with one space each side (word
    boundaries contribute boundary trigrams, per Cavnar & Trenkle).
    Whitespace-class caveat: Python \\s (unicode), Java \\s (ASCII +
    \\x0B) and RE2 \\s (ASCII - \\x0B) agree on [ \\t\\n\\f\\r] only —
    run the textnorm C0-stripping pass first (as the crawl pipeline
    does) and the three paths are identical."""
    return " " + re.sub(r"\s+", " ", text.lower().strip()) + " "


def char_trigrams(text: str) -> list[str]:
    s = normalize(text)
    return [s[i: i + 3] for i in range(len(s) - 2)]


def _profile_matrix(logp: dict[str, list[float]], oov: list[float]):
    """(index_map, matrix) for the VECTORIZED NB fold (round 12, guide
    §4.2): matrix rows are the per-trigram log-prob rows in sorted
    trigram order with the OOV row LAST. Scoring gathers rows by index
    and accumulates with ``np.add.reduce(axis=0)``, which adds rows
    strictly in occurrence order — bit-identical to the scalar
    ``for tg: for j: acc[j] += row[j]`` left fold the oracles replay
    (numpy's pairwise summation applies only to reductions along the
    contiguous last axis, not to outer-axis row accumulation; pinned
    by test_langid_vector_fold_bit_identical)."""
    import numpy as np

    vocab = sorted(logp)
    mat = np.array([logp[tg] for tg in vocab] + [oov], dtype=np.float64)
    return {tg: i for i, tg in enumerate(vocab)}, mat


def _fold_scores(tgs: list[str], idx_map: dict[str, int], mat) -> list[float]:
    """Sum the profile rows of ``tgs`` in occurrence order (vectorized
    twin of the scalar accumulation loop; see :func:`_profile_matrix`).
    Returns the per-language score list; zeros when ``tgs`` is empty."""
    import numpy as np

    if not tgs:
        return [0.0] * mat.shape[1]
    noov = mat.shape[0] - 1
    idx = np.fromiter(
        (idx_map.get(tg, noov) for tg in tgs), dtype=np.intp, count=len(tgs)
    )
    return np.add.reduce(mat[idx], axis=0).tolist()


def build_profiles(k: int = 300, corpora: dict[str, str] | None = None):
    """Derive a model from fixture corpora deterministically:
    per-language top-``k`` trigrams (count desc, trigram asc), union
    vocabulary V, then add-one log-probs over V. Returns
    ``(logp, oov)`` where ``logp[tg] = [per-language ln P]`` (only
    trigrams some language actually saw) and ``oov = [per-language
    ln P of an unseen trigram]``; languages in sorted-key order.
    Defaults to the Latin FIXTURE_CORPORA; passing a different corpora
    dict (e.g. CYRILLIC_CORPORA) is the promised per-script DATA
    change — same algorithm, new tables. Language order = dict
    insertion order (FIXTURE_CORPORA's order IS LANGS — pinned by
    test, since the score-vector layout depends on it)."""
    corpora = FIXTURE_CORPORA if corpora is None else corpora
    langs = list(corpora)
    counts = {lang: Counter(char_trigrams(t)) for lang, t in corpora.items()}
    vocab: set[str] = set()
    for lang in langs:
        top = sorted(counts[lang].items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        vocab.update(tg for tg, _ in top)
    v = len(vocab)
    denom = {}
    for lang in langs:
        total = sum(counts[lang][tg] for tg in vocab)
        denom[lang] = float(total + v + 1)
    oov = [math.log(1.0 / denom[lang]) for lang in langs]
    logp: dict[str, list[float]] = {}
    for tg in sorted(vocab):
        if any(counts[lang][tg] for lang in langs):
            logp[tg] = [
                math.log((counts[lang][tg] + 1.0) / denom[lang]) for lang in langs
            ]
    return logp, oov


_LOGP, _OOV = build_profiles()


def script_counts_py(text: str) -> dict[str, int]:
    """Per-script codepoint counts over SCRIPT_RANGES."""
    return {
        k: len(re.findall(f"[{rng}]", text))
        for k, rng in SCRIPT_RANGES.items()
    }


def dominant_script_py(text: str) -> str:
    """Dominance over SCRIPT_RANGES: the first script in dict order
    with a POSITIVE count >= every other script's count; 'none' when
    the text has no script character at all (digits, punctuation,
    symbols) — the caller maps 'none' to 'unknown', never to a Latin
    trigram score."""
    c = script_counts_py(text)
    for k in SCRIPT_RANGES:
        if c[k] > 0 and all(c[k] >= c[o] for o in SCRIPT_RANGES if o != k):
            return k
    return "none"


def classify_py(text: str) -> str:
    """Scalar reference implementation (tests pin the Spark operator
    against this). Script-dominant non-Latin text routes straight to
    the script-level verdict (ru/el/zh/ja/ko/ar/hi/he/th, with the
    Han+kana -> 'ja' disambiguation); Latin-dominant text is scored
    by the trigram model; script-less text is 'unknown'."""
    if text is None:
        return "unknown"
    tgs = char_trigrams(text) if text.strip() else []
    if not tgs:
        return "unknown"
    dom = dominant_script_py(text)
    if dom == "none":
        return "unknown"
    if dom == "han":
        return "ja" if script_counts_py(text)["kana"] > 0 else "zh"
    if dom != "latin":
        return SCRIPT_LANG[dom]
    scores = [0.0] * len(LANGS)
    for tg in tgs:
        row = _LOGP.get(tg, _OOV)
        for j in range(len(LANGS)):
            scores[j] += row[j]
    best = max(range(len(LANGS)), key=lambda j: (scores[j], -j))
    return LANGS[best]


def lang_id_ngram(
    df: DataFrame,
    text_col: str,
    id_col: str,
    mode: str = "arrow",
    carry: list[str] | None = None,
    spread: bool = True,
) -> DataFrame:
    """(id, pred_lang, n_trigrams, score_<lang>...) — trigram NB
    language ID with the script branch. Two equivalent scoring paths
    (same duality as the blocklist operator, equivalence-tested):

    - ``mode="arrow"`` (default) — one Arrow-batched pandas UDF doing
      dict lookups + a sequential left-fold per document. ~10x faster
      than the expression path: interpreted higher-order functions
      cost ~4-6 us per ELEMENT (the trigram-array build alone
      dominates), while a Python dict lookup inside an Arrow batch is
      ~0.2 us. Same IEEE-754 left-fold order, so results are
      bit-identical to the oracle (hash-proven at sf0.01).
    - ``mode="expr"`` — pure JVM: the profile map as ONE plan-literal
      ``map<string, array<double>>`` folded with aggregate/zip_with.
      Zero Python; keeps whole plans Python-free where that matters
      more than the constant factor.

    Both are zero-shuffle narrow maps over the scan; the final
    script-dominance branch (ru/el/zh) and the Latin argmax/tie-break/
    rounding are shared Spark expression code. ``carry`` lists extra
    input columns to pass through (the pipeline stage carries the whole
    row this way — a narrow projection, never a join-back shuffle)."""
    from python_plugins_spark.functions import norm_text
    from python_plugins_spark.sources.io import spread_scan

    carry = [c for c in (carry or []) if c not in (id_col,)]
    nlangs = len(LANGS)
    # round 12 (guide §2.5): the trigram fold is CPU-bound (Python in
    # arrow mode, interpreted HOFs in expr mode); a 1-split scan would
    # serialize it on one core. No-op on already-parallel inputs;
    # callers that KNOW the input is parallel (lang_id_tiered's routed
    # subsets of its spread+checkpointed base) pass spread=False to
    # skip even the partition-count probe, which costs a physical
    # planning pass of the input subtree.
    if spread:
        df = spread_scan(df)
    if mode == "expr":
        # ONE generated SQL expression for the ~800-entry literal map —
        # building it from individual F.lit() Columns costs thousands
        # of py4j round trips (~6 s of driver time); one parse is
        # instant. Catalyst constant-folds it to a literal MapData.
        map_sql = ", ".join(
            f"'{_sql_q(tg)}', array({', '.join(f'{x!r}D' for x in row)})"
            for tg, row in sorted(_LOGP.items())
        )
        profile_map = F.expr(f"map({map_sql})")
        oov_arr = F.array(*[F.lit(x) for x in _OOV])
        zero_arr = F.array(*[F.lit(0.0) for _ in LANGS])

        p = F.concat(F.lit(" "), norm_text(F.col(text_col)), F.lit(" "))
        n = F.length(p)
        tgs = F.when(
            n >= 3,
            F.transform(
                F.sequence(F.lit(1), n - 2), lambda i: p.substr(i, F.lit(3))
            ),
        ).otherwise(F.array().cast("array<string>"))

        scores = F.aggregate(
            tgs,
            zero_arr,
            lambda acc, tg: F.zip_with(
                acc,
                F.coalesce(F.element_at(profile_map, tg), oov_arr),
                lambda a, b: a + b,
            ),
        )
        d = df.select(
            F.col(id_col),
            *[F.col(c) for c in carry],
            F.col(text_col).alias("_t"),
            F.size(tgs).cast("long").alias("n_trigrams"),
            scores.alias("_sc"),
        )
    elif mode == "arrow":
        logp, oov, nl = _LOGP, _OOV, len(LANGS)
        script_res = [
            (k, re.compile(f"[{rng}]")) for k, rng in SCRIPT_RANGES.items()
        ]
        nsc = len(script_res)

        # array return type (trigram count, scores, then the ten
        # per-script codepoint counts — all exact as double below
        # 2^53): the counts ride the SAME Arrow pass as the scoring
        # fold, so extending the script table costs no extra JVM
        # regex scans over the corpus (adding six scripts in round 9
        # had made the JVM-count variant 1.8x slower). Python re and
        # Java regex count these BMP literal-range classes
        # identically (surrogate halves match neither).
        idx_map, mat = _profile_matrix(logp, oov)

        @F.pandas_udf("array<double>")
        def _score(col: pd.Series) -> pd.Series:
            out = []
            for text in col:
                tgs = (
                    char_trigrams(text)
                    if text is not None and text.strip()
                    else []
                )
                acc = _fold_scores(tgs, idx_map, mat)
                t = text or ""
                counts = [float(len(rx.findall(t))) for _, rx in script_res]
                out.append([float(len(tgs))] + acc + counts)
            return pd.Series(out)

        d = df.select(
            F.col(id_col),
            *[F.col(c) for c in carry],
            _score(F.col(text_col)).alias("_r"),
        ).select(
            id_col, *carry,
            F.element_at("_r", 1).cast("long").alias("n_trigrams"),
            F.slice("_r", 2, nlangs).alias("_sc"),
            *[
                F.element_at("_r", 2 + nlangs + j).alias(f"_c_{k}")
                for j, (k, _) in enumerate(script_res)
            ],
        )
    else:
        raise ValueError(f"unknown lang_id_ngram mode {mode!r}")
    sc = {lang: F.element_at("_sc", j + 1) for j, lang in enumerate(LANGS)}
    # ONE SQL parse for the 23-way argmax chain (round 12, guide §1.2
    # per-task -> plan-build): the Column-by-Column when/greatest form
    # cost ~600 py4j round trips of DRIVER latency per plan build —
    # this is the same fix as the module's literal-map SQL strings.
    # when/otherwise IS CASE WHEN, so the parsed expression tree (and
    # every result bit) is identical; the unrolled otherwise-chain
    # flattens to WHEN branches in ascending j with ELSE NULL.
    _sc_at = [f"element_at(_sc, {j + 1})" for j in range(nlangs)]
    best_sql = (
        "CASE "
        + " ".join(
            f"WHEN {_sc_at[j]} >= greatest("
            + ", ".join(_sc_at[i] for i in range(nlangs) if i != j)
            + f") THEN '{LANGS[j]}'"
            for j in range(nlangs)
        )
        + " ELSE CAST(NULL AS STRING) END"
    )
    if mode == "expr":
        # per-script counts as columns (each regex runs once per row,
        # not once per CASE-chain reference); the arrow path computed
        # them inside its batch pass above
        d = d.select(
            "*",
            *[
                F.length(
                    F.regexp_replace(F.col("_t"), f"[^{rng}]", "")
                ).alias(f"_c_{k}")
                for k, rng in SCRIPT_RANGES.items()
            ],
        )
    def _wins_sql(k: str) -> str:
        # first-in-priority-with-positive-max wins (dict order = the
        # tie-break; the CASE chain evaluates in that order, so '>='
        # against every other script is exactly first-wins-ties)
        return " AND ".join(
            [f"_c_{k} > 0"]
            + [f"_c_{k} >= _c_{o}" for o in SCRIPT_RANGES if o != k]
        )

    verdicts_sql = {
        "latin": best_sql,
        # Han+kana -> kanji-bearing Japanese; pure Han -> zh
        "han": "CASE WHEN _c_kana > 0 THEN 'ja' ELSE 'zh' END",
    }
    # same one-parse treatment for the ten-script dominance chain
    # (~100 more round trips in the Column form); the reversed
    # otherwise-chain flattens to WHEN branches in dict order with
    # ELSE 'unknown' (no script character at all)
    chain_sql = (
        "CASE "
        + " ".join(
            f"WHEN {_wins_sql(k)} THEN "
            + verdicts_sql.get(
                k, f"'{SCRIPT_LANG[k]}'" if k in SCRIPT_LANG else "NULL"
            )
            for k in SCRIPT_RANGES
        )
        + " ELSE 'unknown' END"
    )
    pred = F.when(F.col("n_trigrams") == 0, F.lit("unknown")).otherwise(
        F.expr(chain_sql)
    )
    # confidence: (best - second-best) log-prob per trigram — what a
    # production pipeline thresholds on before trusting the verdict
    srt = F.sort_array("_sc", asc=False)
    margin = F.when(
        F.col("n_trigrams") > 0,
        (F.element_at(srt, 1) - F.element_at(srt, 2))
        / F.col("n_trigrams").cast("double"),
    ).otherwise(F.lit(0.0))
    return d.select(
        id_col,
        *carry,
        pred.alias("pred_lang"),
        "n_trigrams",
        F.round(margin, 6).alias("margin"),
        *[F.round(sc[lang], 4).alias(f"score_{lang}") for lang in LANGS],
    )


def _sql_q(s: str) -> str:
    return s.replace("'", "''")


def lang_id_ngram_oracle_sql(table: str, text_col: str, id_col: str) -> str:
    """DuckDB twin: same MAP literal, same trigram windows, same LEFT
    fold (list_reduce with a prepended init mirrors ``aggregate``'s
    initial value), so the double sums are bit-identical. The map is
    hoisted into a cross-joined one-row relation — referenced from
    inside the lambda as a column, DuckDB builds it once per row
    instead of once per ELEMENT (the literal-in-lambda form re-built
    the 600-entry map per trigram: ~100x slower)."""
    from python_plugins_spark.functions import oracle_fragments as O

    nlangs = len(LANGS)
    map_entries = ", ".join(
        f"'{_sql_q(tg)}': [{', '.join(repr(x) for x in row)}]::DOUBLE[]"
        for tg, row in sorted(_LOGP.items())
    )
    oov = f"[{', '.join(repr(x) for x in _OOV)}]::DOUBLE[]"
    zero = f"[{', '.join('0.0' for _ in LANGS)}]::DOUBLE[]"
    add = ", ".join(f"a[{j + 1}] + b[{j + 1}]" for j in range(nlangs))
    norm = O.sql_norm_text(text_col)

    def _sql_range(rng: str) -> str:
        # RE2 hex escapes for the non-ASCII range endpoints, so the SQL
        # stays ASCII while matching the same codepoints as the Java
        # pattern built from the literal SCRIPT_RANGES characters
        return "".join(
            ch if ord(ch) < 128 else f"\\x{{{ord(ch):04x}}}" for ch in rng
        )

    c = {
        k: f"length(regexp_replace(_t, '[^{_sql_range(rng)}]', '', 'g'))"
        for k, rng in SCRIPT_RANGES.items()
    }
    count_cols = ",\n             ".join(f"{c[k]} AS c_{k}" for k in SCRIPT_RANGES)
    sel_scores = ", ".join(
        f"round(sc[{j + 1}], 4) AS score_{lang}" for j, lang in enumerate(LANGS)
    )
    best = "NULL"
    for j in range(nlangs - 1, -1, -1):
        lang = LANGS[j]
        others = ", ".join(f"sc[{i + 1}]" for i, o in enumerate(LANGS) if o != lang)
        best = (
            f"CASE WHEN sc[{j + 1}] >= greatest({others}) "
            f"THEN '{lang}' ELSE {best} END"
        )
    # the script branch, generated from the same SCRIPT_RANGES /
    # SCRIPT_LANG tables as the Spark CASE chain: first script in
    # priority order with a positive count >= all others wins; Han
    # resolves ja-if-kana-present; no script at all -> unknown
    whens = []
    for k in SCRIPT_RANGES:
        cond = f"c_{k} > 0 AND " + " AND ".join(
            f"c_{k} >= c_{o}" for o in SCRIPT_RANGES if o != k
        )
        if k == "latin":
            verdict = best
        elif k == "han":
            verdict = "CASE WHEN c_kana > 0 THEN 'ja' ELSE 'zh' END"
        else:
            verdict = f"'{SCRIPT_LANG[k]}'"
        whens.append(f"WHEN {cond}\n                THEN {verdict}")
    pred_case = (
        "CASE WHEN n_trigrams = 0 THEN 'unknown'\n                "
        + "\n                ".join(whens)
        + "\n                ELSE 'unknown' END"
    )
    return f"""
    WITH pad AS (
      SELECT {id_col}, {text_col} AS _t,
             ' ' || {norm} || ' ' AS p
      FROM {table}
    ),
    tg AS (
      SELECT {id_col}, _t,
             CASE WHEN p IS NULL OR length(p) < 3 THEN []::VARCHAR[]
                  ELSE list_transform(range(1, length(p) - 1),
                                      i -> substr(p, i, 3)) END AS tgs
      FROM pad
    ),
    sc AS (
      SELECT {id_col}, _t, len(tgs)::BIGINT AS n_trigrams,
             list_reduce(
               list_prepend({zero},
                 list_transform(tgs,
                   t -> coalesce(_m[t][1], {oov}))),
               (a, b) -> [{add}]) AS sc
      FROM tg CROSS JOIN (SELECT MAP {{{map_entries}}} AS _m)
    ),
    cs AS (
      SELECT *,
             {count_cols}
      FROM sc
    )
    SELECT {id_col},
           {pred_case} AS pred_lang,
           n_trigrams,
           CASE WHEN n_trigrams > 0 THEN
             round((list_sort(sc, 'DESC')[1] - list_sort(sc, 'DESC')[2])
                   / n_trigrams::DOUBLE, 6)
           ELSE 0.0 END AS margin,
           {sel_scores}
    FROM cs
    """


# ------------------------------------------------------------ cyrillic
# The per-script extension the script branch was built for: once
# dominant_script says "cyrillic", THIS model separates the languages
# the script-level verdict lumped together as 'ru'. Same honesty
# contract as FIXTURE_CORPORA: original prose written for this repo
# (everyday + technical register per language), profiles derived at
# import time by the same build_profiles — a DATA change, zero new
# algorithm code.
CYRILLIC_CORPORA: dict[str, str] = {
    "ru": (
        "Старый вокзал стоял на краю маленького города, и каждое утро "
        "одни и те же люди ждали первый поезд. Они говорили о погоде, о "
        "работе и о соседях, пока туман медленно полз над путями. Зимой "
        "ветер приносил снег в открытый зал, и кассир пил свой чай и "
        "смотрел на часы. Поезда редко приходили вовремя, но никто "
        "всерьёз не жаловался, потому что все знали друг друга много "
        "лет. Вечером, когда над платформой горели огни, всё казалось "
        "тихим и простым. "
        "Современные вычислительные системы обрабатывают информацию "
        "через несколько уровней абстракции. Распределённый механизм "
        "запросов делит огромные наборы данных между многими машинами, "
        "применяет фильтры и агрегации параллельно и затем объединяет "
        "частичные результаты. Исследователи тщательно измеряют "
        "пропускную способность и задержку, потому что "
        "производительность зависит от перемещения данных больше, чем "
        "от чистого вычисления. Эффективные алгоритмы уменьшают сетевой "
        "трафик, используют локальность и распределяют работу "
        "динамически."
    ),
    "uk": (
        "Стара бібліотека стояла на розі площі, і щоранку ті самі "
        "читачі піднімалися її кам'яними сходами. Вони приходили по "
        "тишу більше, ніж по книжки, хоча полиці тримали майже все, "
        "чого могла бажати допитлива душа. Надворі торговці кричали про "
        "свіжий хліб і зимові яблука, але всередині було чути лише "
        "шелест сторінок. Коли після обіду починався дощ, студенти "
        "збиралися біля високих вікон і дивилися, як вода біжить уздовж "
        "вулиці. Бібліотекарка знала більшість із них на ім'я і "
        "відкладала нові надходження для тих, хто просив. "
        "Сучасні обчислювальні системи обробляють інформацію через "
        "кілька рівнів абстракції. Розподілений рушій запитів ділить "
        "величезні набори даних між багатьма машинами, застосовує "
        "фільтри та агрегації паралельно, а потім об'єднує часткові "
        "результати. Дослідники ретельно вимірюють пропускну здатність "
        "і затримку, бо продуктивність залежить від переміщення даних "
        "більше, ніж від самого обчислення. Ефективні алгоритми "
        "зменшують мережевий трафік, використовують локальність і "
        "розподіляють роботу динамічно."
    ),
    "bg": (
        "Площадът на градчето се пълнеше с хора всяка неделя сутрин. "
        "Продавачите нареждаха сергиите си с плодове, хляб и сирене, а "
        "възрастните жени говореха за времето и за реколтата, докато "
        "мъжете спореха за водата и за пътищата. По пладне от къщите "
        "идваше миризма на ориз и печено, и животът следваше своя "
        "спокоен ход. Никой не бързаше в това място, защото важното "
        "винаги беше наблизо, а чуждото можеше да почака. Вечер "
        "камбаната биеше бавно и децата се прибираха по тесните улици. "
        "Съвременните изчислителни системи обработват информация през "
        "няколко равнища на абстракция. Разпределеният механизъм за "
        "заявки разделя огромните набори от данни между много машини, "
        "прилага филтри и агрегации паралелно и после обединява "
        "частичните резултати. Изследователите внимателно измерват "
        "пропускателната способност и закъснението, защото "
        "производителността зависи повече от движението на данните, "
        "отколкото от самото изчисление. Ефективните алгоритми "
        "намаляват мрежовия трафик, използват локалността и разпределят "
        "работата динамично."
    ),
}
CYR_LANGS = tuple(CYRILLIC_CORPORA)
_CYR_LOGP, _CYR_OOV = build_profiles(corpora=CYRILLIC_CORPORA)


def classify_cyrillic_py(text: str) -> str:
    """Scalar reference for the Cyrillic model (tests pin the Spark
    operator against this)."""
    if text is None or not text.strip():
        return "unknown"
    scores = [0.0] * len(CYR_LANGS)
    for tg in char_trigrams(text):
        row = _CYR_LOGP.get(tg, _CYR_OOV)
        for j in range(len(CYR_LANGS)):
            scores[j] += row[j]
    best = max(range(len(CYR_LANGS)), key=lambda j: (scores[j], -j))
    return CYR_LANGS[best]


def lang_id_cyrillic(
    df: DataFrame,
    text_col: str,
    id_col: str,
    carry: list[str] | None = None,
    spread: bool = True,
) -> DataFrame:
    """(id, pred_lang, n_trigrams, margin, score_ru/uk/bg) — the
    per-script model downstream of the 'cyrillic' branch: multinomial
    NB over character trigrams, ru/uk/bg profiles from
    CYRILLIC_CORPORA. Same Arrow-batched sequential left-fold as the
    Latin flagship (bit-identical to the oracle's list_reduce), zero
    shuffles."""
    from python_plugins_spark.sources.io import spread_scan

    carry = [c for c in (carry or []) if c != id_col]
    if spread:
        df = spread_scan(df)  # §2.5 — no-op on already-parallel inputs
    logp, oov, nl = _CYR_LOGP, _CYR_OOV, len(CYR_LANGS)

    idx_map, mat = _profile_matrix(logp, oov)

    @F.pandas_udf("array<double>")
    def _score(col: pd.Series) -> pd.Series:
        out = []
        for text in col:
            tgs = (
                char_trigrams(text)
                if text is not None and text.strip()
                else []
            )
            out.append([float(len(tgs))] + _fold_scores(tgs, idx_map, mat))
        return pd.Series(out)

    d = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        _score(F.col(text_col)).alias("_r"),
    ).select(
        id_col, *carry,
        F.element_at("_r", 1).cast("long").alias("n_trigrams"),
        F.slice("_r", 2, nl).alias("_sc"),
    )
    sc = {lang: F.element_at("_sc", j + 1) for j, lang in enumerate(CYR_LANGS)}
    best = F.lit(None).cast("string")
    for j in range(nl - 1, -1, -1):
        lang = CYR_LANGS[j]
        others = [sc[o] for o in CYR_LANGS if o != lang]
        best = F.when(sc[lang] >= F.greatest(*others), F.lit(lang)).otherwise(best)
    pred = F.when(F.col("n_trigrams") == 0, F.lit("unknown")).otherwise(best)
    srt = F.sort_array("_sc", asc=False)
    margin = F.when(
        F.col("n_trigrams") > 0,
        (F.element_at(srt, 1) - F.element_at(srt, 2))
        / F.col("n_trigrams").cast("double"),
    ).otherwise(F.lit(0.0))
    return d.select(
        id_col,
        *carry,
        pred.alias("pred_lang"),
        "n_trigrams",
        F.round(margin, 6).alias("margin"),
        *[F.round(sc[lang], 4).alias(f"score_{lang}") for lang in CYR_LANGS],
    )


def lang_id_cyrillic_oracle_sql(table: str, text_col: str, id_col: str) -> str:
    """DuckDB twin of lang_id_cyrillic: same MAP literal, same trigram
    windows, same LEFT fold — bit-identical score sums (the Latin
    oracle's structure minus the script branch)."""
    from python_plugins_spark.functions import oracle_fragments as O

    nl = len(CYR_LANGS)
    map_entries = ", ".join(
        f"'{_sql_q(tg)}': [{', '.join(repr(x) for x in row)}]::DOUBLE[]"
        for tg, row in sorted(_CYR_LOGP.items())
    )
    oov = f"[{', '.join(repr(x) for x in _CYR_OOV)}]::DOUBLE[]"
    zero = f"[{', '.join('0.0' for _ in CYR_LANGS)}]::DOUBLE[]"
    add = ", ".join(f"a[{j + 1}] + b[{j + 1}]" for j in range(nl))
    norm = O.sql_norm_text(text_col)
    sel_scores = ", ".join(
        f"round(sc[{j + 1}], 4) AS score_{lang}"
        for j, lang in enumerate(CYR_LANGS)
    )
    best = "NULL"
    for j in range(nl - 1, -1, -1):
        lang = CYR_LANGS[j]
        others = ", ".join(
            f"sc[{i + 1}]" for i, o in enumerate(CYR_LANGS) if o != lang
        )
        best = (
            f"CASE WHEN sc[{j + 1}] >= greatest({others}) "
            f"THEN '{lang}' ELSE {best} END"
        )
    return f"""
    WITH pad AS (
      SELECT {id_col}, ' ' || {norm} || ' ' AS p FROM {table}
    ),
    tg AS (
      SELECT {id_col},
             CASE WHEN p IS NULL OR length(p) < 3 THEN []::VARCHAR[]
                  ELSE list_transform(range(1, length(p) - 1),
                                      i -> substr(p, i, 3)) END AS tgs
      FROM pad
    ),
    sc AS (
      SELECT {id_col}, len(tgs)::BIGINT AS n_trigrams,
             list_reduce(
               list_prepend({zero},
                 list_transform(tgs,
                   t -> coalesce(_m[t][1], {oov}))),
               (a, b) -> [{add}]) AS sc
      FROM tg CROSS JOIN (SELECT MAP {{{map_entries}}} AS _m)
    )
    SELECT {id_col},
           CASE WHEN n_trigrams = 0 THEN 'unknown' ELSE {best} END
             AS pred_lang,
           n_trigrams,
           CASE WHEN n_trigrams > 0 THEN
             round((list_sort(sc, 'DESC')[1] - list_sort(sc, 'DESC')[2])
                   / n_trigrams::DOUBLE, 6)
           ELSE 0.0 END AS margin,
           {sel_scores}
    FROM sc
    """


# ----------------------------------------------------------------- cjk
# The per-script tier behind the Han/kana/Hangul branch (ask: ja/zh
# disambiguation beyond kana presence). Branch order is linguistic
# fact, not statistics: Hangul appears ONLY in Korean, kana ONLY in
# Japanese, so either's presence decides outright; the trigram model
# is reached only for the Han-only overlap (Chinese, or the rare
# kanji-only Japanese fragment), where character CHOICE separates the
# languages (simplified vs traditional/shinjitai forms, distinct
# function characters). Same honesty contract as FIXTURE_CORPORA:
# original prose written for this repo (everyday + technical register
# per language), profiles derived at import time by the same
# build_profiles — a DATA change, zero new algorithm code.
CJK_CORPORA: dict[str, str] = {
    "zh": (
        "老图书馆坐落在广场的拐角，每天早晨同样的读者沿着磨旧的石阶走上"
        "去。他们来这里更多是为了安静，而不是为了书，虽然书架上几乎什么"
        "都有。外面的集市上，商贩叫卖新鲜的面包和冬天的苹果，里面却只有"
        "翻动书页的声音。下午下雨的时候，学生们聚在高高的窗边，看着雨水"
        "沿着街道流下去。管理员认识他们中的大多数人，会为提出请求的人留"
        "下新到的书。这个地方一点也不现代，但没有人想改变它，因为小城本"
        "来就应该这样运转，缓慢而齐心。"
        "现代计算系统通过多层抽象来处理信息。分布式查询引擎把巨大的数据"
        "集划分到许多机器上，并行地应用过滤和聚合，然后把部分结果合并起"
        "来。研究人员仔细测量吞吐量和延迟，因为性能更多取决于数据移动，"
        "而不是纯粹的计算。高效的算法减少网络流量，利用局部性，并且动态"
        "地分配工作。文档描述了配置项、常见的错误以及生产环境推荐的检查"
        "方法。"
    ),
    "ja": (
        "古い図書館は広場の角に建っていて、毎朝同じ読者たちがすり減った"
        "石段を上っていった。彼らは本のためというより静けさのために通っ"
        "ていたが、棚には好奇心のある人が望むほとんどすべてが並んでいた。"
        "外では市場の商人が焼きたてのパンと冬の林檎を売る声を張り上げて"
        "いたけれど、中では頁をめくる音しか聞こえなかった。午後に雨が来"
        "ると、学生たちは高い窓のそばに集まり、水が通りを流れていくのを"
        "眺めた。司書はほとんどの利用者の名前を知っていて、頼まれた新刊"
        "を取り置いてくれた。"
        "現代の計算機システムは幾つもの抽象層を通して情報を処理する。分"
        "散問い合わせ処理系は巨大な資料集合を多数の計算機に分割し、絞り"
        "込みと集約を並列に適用してから部分結果を統合する。研究者は処理"
        "量と遅延を注意深く測定する。性能は純粋な計算よりも資料の移動に"
        "左右されるからである。効率の良い算法は通信量を減らし、局所性を"
        "生かし、仕事を動的に配分する。"
    ),
    "ko": (
        "오래된 도서관은 광장 모퉁이에 서 있었고, 매일 아침 같은 독자들이 "
        "닳아 버린 돌계단을 올라갔다. 그들은 책보다 고요함을 찾아왔지만, "
        "서가에는 호기심 많은 사람이 바랄 만한 거의 모든 것이 꽂혀 있었다. "
        "밖에서는 시장 상인들이 갓 구운 빵과 겨울 사과를 외치며 팔았지만, "
        "안에서는 책장 넘기는 소리만 들렸다. 오후에 비가 오면 학생들은 높은 "
        "창가에 모여 물이 거리를 따라 흘러가는 것을 바라보았다. 사서는 "
        "이용자 대부분의 이름을 알았고, 부탁하는 사람을 위해 신간을 따로 "
        "챙겨 두었다. "
        "현대 컴퓨터 시스템은 여러 추상화 계층을 거쳐 정보를 처리한다. "
        "분산 질의 엔진은 거대한 자료 집합을 많은 기계로 나누고, 필터와 "
        "집계를 병렬로 적용한 다음 부분 결과를 합친다. 연구자들은 처리량과 "
        "지연을 주의 깊게 측정하는데, 성능은 순수한 계산보다 자료 이동에 "
        "더 크게 좌우되기 때문이다. 효율적인 알고리즘은 네트워크 트래픽을 "
        "줄이고 지역성을 활용하며 작업을 동적으로 분배한다."
    ),
}
CJK_LANGS = tuple(CJK_CORPORA)
_CJK_LOGP, _CJK_OOV = build_profiles(corpora=CJK_CORPORA)


def classify_cjk_py(text: str) -> str:
    """Scalar reference for the CJK tier (tests pin the Spark
    operator against this): Hangul presence -> 'ko', kana presence ->
    'ja' (unique-script facts), else the trigram NB over the Han-only
    overlap."""
    if text is None or not text.strip():
        return "unknown"
    c = script_counts_py(text)
    if c["hangul"] > 0:
        return "ko"
    if c["kana"] > 0:
        return "ja"
    scores = [0.0] * len(CJK_LANGS)
    for tg in char_trigrams(text):
        row = _CJK_LOGP.get(tg, _CJK_OOV)
        for j in range(len(CJK_LANGS)):
            scores[j] += row[j]
    best = max(range(len(CJK_LANGS)), key=lambda j: (scores[j], -j))
    return CJK_LANGS[best]


def lang_id_cjk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    carry: list[str] | None = None,
    spread: bool = True,
) -> DataFrame:
    """(id, pred_lang, n_trigrams, margin, score_zh/ja/ko) — the
    per-script model downstream of the CJK branch, mirroring
    lang_id_cyrillic: unique-script presence decides first (Hangul ->
    'ko', kana -> 'ja' — linguistic facts, zero model risk), and the
    trigram NB over CJK_CORPORA separates the Han-only overlap by
    character choice. Same Arrow-batched sequential left-fold as the
    Latin flagship (bit-identical to the oracle's list_reduce), zero
    shuffles; the presence counts are JVM regexp expressions."""
    from python_plugins_spark.sources.io import spread_scan

    carry = [c for c in (carry or []) if c != id_col]
    if spread:
        df = spread_scan(df)  # §2.5 — no-op on already-parallel inputs
    logp, oov, nl = _CJK_LOGP, _CJK_OOV, len(CJK_LANGS)

    idx_map, mat = _profile_matrix(logp, oov)

    @F.pandas_udf("array<double>")
    def _score(col: pd.Series) -> pd.Series:
        out = []
        for text in col:
            tgs = (
                char_trigrams(text)
                if text is not None and text.strip()
                else []
            )
            out.append([float(len(tgs))] + _fold_scores(tgs, idx_map, mat))
        return pd.Series(out)

    d = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.col(text_col).alias("_t"),
        _score(F.col(text_col)).alias("_r"),
    ).select(
        id_col, *carry, "_t",
        F.element_at("_r", 1).cast("long").alias("n_trigrams"),
        F.slice("_r", 2, nl).alias("_sc"),
    )
    sc = {lang: F.element_at("_sc", j + 1) for j, lang in enumerate(CJK_LANGS)}
    best = F.lit(None).cast("string")
    for j in range(nl - 1, -1, -1):
        lang = CJK_LANGS[j]
        others = [sc[o] for o in CJK_LANGS if o != lang]
        best = F.when(sc[lang] >= F.greatest(*others), F.lit(lang)).otherwise(best)
    cnt = {
        k: F.length(
            F.regexp_replace(F.col("_t"), f"[^{SCRIPT_RANGES[k]}]", "")
        )
        for k in ("hangul", "kana")
    }
    pred = (
        F.when(F.col("n_trigrams") == 0, F.lit("unknown"))
        .when(cnt["hangul"] > 0, F.lit("ko"))
        .when(cnt["kana"] > 0, F.lit("ja"))
        .otherwise(best)
    )
    srt = F.sort_array("_sc", asc=False)
    margin = F.when(
        F.col("n_trigrams") > 0,
        (F.element_at(srt, 1) - F.element_at(srt, 2))
        / F.col("n_trigrams").cast("double"),
    ).otherwise(F.lit(0.0))
    return d.select(
        id_col,
        *carry,
        pred.alias("pred_lang"),
        "n_trigrams",
        F.round(margin, 6).alias("margin"),
        *[F.round(sc[lang], 4).alias(f"score_{lang}") for lang in CJK_LANGS],
    )


def lang_id_cjk_oracle_sql(table: str, text_col: str, id_col: str) -> str:
    """DuckDB twin of lang_id_cjk: same MAP literal, same trigram
    windows, same LEFT fold, same presence-branch — bit-identical
    score sums (the Cyrillic oracle's structure plus the branch)."""
    from python_plugins_spark.functions import oracle_fragments as O

    nl = len(CJK_LANGS)
    map_entries = ", ".join(
        f"'{_sql_q(tg)}': [{', '.join(repr(x) for x in row)}]::DOUBLE[]"
        for tg, row in sorted(_CJK_LOGP.items())
    )
    oov = f"[{', '.join(repr(x) for x in _CJK_OOV)}]::DOUBLE[]"
    zero = f"[{', '.join('0.0' for _ in CJK_LANGS)}]::DOUBLE[]"
    add = ", ".join(f"a[{j + 1}] + b[{j + 1}]" for j in range(nl))
    norm = O.sql_norm_text(text_col)

    def _sql_range(rng: str) -> str:
        return "".join(
            ch if ord(ch) < 128 else f"\\x{{{ord(ch):04x}}}" for ch in rng
        )

    c = {
        k: (
            "length(regexp_replace(_t, "
            f"'[^{_sql_range(SCRIPT_RANGES[k])}]', '', 'g'))"
        )
        for k in ("hangul", "kana")
    }
    sel_scores = ", ".join(
        f"round(sc[{j + 1}], 4) AS score_{lang}"
        for j, lang in enumerate(CJK_LANGS)
    )
    best = "NULL"
    for j in range(nl - 1, -1, -1):
        lang = CJK_LANGS[j]
        others = ", ".join(
            f"sc[{i + 1}]" for i, o in enumerate(CJK_LANGS) if o != lang
        )
        best = (
            f"CASE WHEN sc[{j + 1}] >= greatest({others}) "
            f"THEN '{lang}' ELSE {best} END"
        )
    return f"""
    WITH pad AS (
      SELECT {id_col}, {text_col} AS _t,
             ' ' || {norm} || ' ' AS p
      FROM {table}
    ),
    tg AS (
      SELECT {id_col}, _t,
             CASE WHEN p IS NULL OR length(p) < 3 THEN []::VARCHAR[]
                  ELSE list_transform(range(1, length(p) - 1),
                                      i -> substr(p, i, 3)) END AS tgs
      FROM pad
    ),
    sc AS (
      SELECT {id_col}, _t, len(tgs)::BIGINT AS n_trigrams,
             list_reduce(
               list_prepend({zero},
                 list_transform(tgs,
                   t -> coalesce(_m[t][1], {oov}))),
               (a, b) -> [{add}]) AS sc
      FROM tg CROSS JOIN (SELECT MAP {{{map_entries}}} AS _m)
    )
    SELECT {id_col},
           CASE WHEN n_trigrams = 0 THEN 'unknown'
                WHEN {c['hangul']} > 0 THEN 'ko'
                WHEN {c['kana']} > 0 THEN 'ja'
                ELSE {best} END AS pred_lang,
           n_trigrams,
           CASE WHEN n_trigrams > 0 THEN
             round((list_sort(sc, 'DESC')[1] - list_sort(sc, 'DESC')[2])
                   / n_trigrams::DOUBLE, 6)
           ELSE 0.0 END AS margin,
           {sel_scores}
    FROM sc
    """


# -------------------------------------------------------- arabic script
# The third per-script tier (after Cyrillic and CJK), downstream of
# the 'arabic' branch: Arabic script is shared by Arabic, Persian
# (Farsi), and Urdu, but the three ORTHOGRAPHIES have distinctive
# letter repertoires — public linguistic facts, no model needed:
#
#   - Urdu-only letters: retroflex ٹ (U+0679) ڈ (U+0688) ڑ (U+0691),
#     gol he ہ (U+06C1), yeh barree ے (U+06D2);
#   - Perso-Arabic extensions shared by Persian AND Urdu, absent from
#     Arabic: پ (U+067E) چ (U+0686) ژ (U+0698) گ (U+06AF), plus keheh
#     ک (U+06A9) and farsi yeh ی (U+06CC) where Arabic writes
#     ك (U+0643) / ي (U+064A).
#
# So: any Urdu-only letter -> 'ur'; else any Perso-Arabic extension
# -> 'fa'; else -> 'ar'. HONESTY BOUNDARY (documented, not hidden): a
# short Urdu fragment that happens to avoid its distinctive letters
# routes 'fa', and a repertoire-neutral fragment (shared letters
# only) routes 'ar' — character-repertoire classification is exact
# precisely when the text uses its orthography's own letters, which
# running prose in all three languages does.
URDU_MARKS = "ٹڈڑہے"
PERSIAN_MARKS = "پچژگکی"


def classify_arabic_script_py(text: str) -> str:
    """Scalar reference for the Arabic-script tier."""
    if text is None or not text.strip():
        return "unknown"
    if len(re.findall(f"[{SCRIPT_RANGES['arabic']}]", text)) == 0:
        return "unknown"
    if any(c in text for c in URDU_MARKS):
        return "ur"
    if any(c in text for c in PERSIAN_MARKS):
        return "fa"
    return "ar"


def lang_id_arabic_script(
    df: DataFrame,
    text_col: str,
    id_col: str,
    carry: list[str] | None = None,
) -> DataFrame:
    """(id, n_arabic, n_urdu_marks, n_persian_marks, pred_lang) —
    ar/fa/ur by orthography-distinctive letters (see module table).
    Pure JVM regexp-count expressions, zero Python, zero shuffles —
    a narrow map over the scan at any corpus size."""
    carry = [c for c in (carry or []) if c != id_col]
    n_ar = F.length(
        F.regexp_replace(
            F.col(text_col), f"[^{SCRIPT_RANGES['arabic']}]", ""
        )
    ).cast("long")
    n_ur = F.length(
        F.regexp_replace(F.col(text_col), f"[^{URDU_MARKS}]", "")
    ).cast("long")
    n_fa = F.length(
        F.regexp_replace(F.col(text_col), f"[^{PERSIAN_MARKS}]", "")
    ).cast("long")
    pred = (
        F.when(F.col(text_col).isNull(), F.lit("unknown"))
        .when(n_ar == 0, F.lit("unknown"))
        .when(n_ur > 0, F.lit("ur"))
        .when(n_fa > 0, F.lit("fa"))
        .otherwise(F.lit("ar"))
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        n_ar.alias("n_arabic"),
        n_ur.alias("n_urdu_marks"),
        n_fa.alias("n_persian_marks"),
        pred.alias("pred_lang"),
    )


def lang_id_arabic_script_oracle_sql(
    table: str, text_col: str, id_col: str
) -> str:
    """DuckDB twin: identical codepoint classes (RE2 hex escapes) and
    the identical presence CASE chain."""

    def _rng(rng: str) -> str:
        return "".join(
            ch if ord(ch) < 128 else f"\\x{{{ord(ch):04x}}}" for ch in rng
        )

    c_ar = (
        f"length(regexp_replace({text_col}, "
        f"'[^{_rng(SCRIPT_RANGES['arabic'])}]', '', 'g'))"
    )
    c_ur = (
        f"length(regexp_replace({text_col}, '[^{_rng(URDU_MARKS)}]', '', 'g'))"
    )
    c_fa = (
        f"length(regexp_replace({text_col}, "
        f"'[^{_rng(PERSIAN_MARKS)}]', '', 'g'))"
    )
    return f"""
    SELECT {id_col},
           CAST({c_ar} AS BIGINT) AS n_arabic,
           CAST({c_ur} AS BIGINT) AS n_urdu_marks,
           CAST({c_fa} AS BIGINT) AS n_persian_marks,
           CASE WHEN {text_col} IS NULL THEN 'unknown'
                WHEN {c_ar} = 0 THEN 'unknown'
                WHEN {c_ur} > 0 THEN 'ur'
                WHEN {c_fa} > 0 THEN 'fa'
                ELSE 'ar' END AS pred_lang
    FROM {table}
    """


# ------------------------------------------------------- devanagari
# The fourth per-script tier, downstream of the 'hi' branch:
# Devanagari is shared by Hindi, Marathi, and Nepali (~100 M Marathi
# + Nepali speakers who a blanket 'hi' verdict confidently
# mislabels). One orthography-distinctive letter exists — retroflex
# lateral ळ (U+0933), a core everyday-vocabulary letter in Marathi
# (वेळ 'time', शाळा 'school', जवळ 'near') that standard Hindi and
# Nepali orthography do not use — so its presence decides 'mr'
# outright (the CJK tier's presence-branch pattern); the hi/ne/
# ळ-less-mr overlap falls to the trigram NB, where the three
# languages' verb morphology (है/थे vs आहे/असे vs छ/थियो) and
# Nepali's हरू plural separate cleanly. Same honesty contract as
# FIXTURE_CORPORA: original prose written for this repo (everyday +
# technical register per language), profiles derived at import time
# by the same build_profiles — a DATA change, zero new algorithm
# code. Documented boundary: a Marathi fragment avoiding ळ is
# trigram-scored (usually still 'mr'); Sanskrit text routes to
# whichever of the three its trigrams resemble most (no 'sa' class).
DEVANAGARI_CORPORA: dict[str, str] = {
    "hi": (
        "पुराना बाज़ार शहर के बीच में था और हर सुबह वही लोग सब्ज़ी और फल "
        "ख़रीदने आते थे। दुकानदार चाय पीते हुए मौसम और फ़सल की बातें करते "
        "थे। सर्दियों में धुंध देर तक गलियों में टिकी रहती थी और बच्चे "
        "स्कूल जाते समय हाथ मलते थे। शाम को जब दीये जलते थे तो पूरा "
        "मोहल्ला शांत और सादा लगता था। किसी को जल्दी नहीं थी क्योंकि सब "
        "एक दूसरे को बरसों से जानते थे। "
        "आधुनिक संगणन प्रणालियाँ सूचना को अमूर्तता के कई स्तरों से "
        "संसाधित करती हैं। वितरित क्वेरी इंजन विशाल डेटा समूहों को अनेक "
        "मशीनों में बाँटता है, फ़िल्टर और समुच्चयन समानांतर चलाता है और "
        "फिर आंशिक परिणामों को जोड़ता है। शोधकर्ता प्रवाह क्षमता और "
        "विलंबता को ध्यान से मापते हैं क्योंकि प्रदर्शन गणना से अधिक डेटा "
        "की आवाजाही पर निर्भर करता है। कुशल कलनविधियाँ नेटवर्क यातायात "
        "घटाती हैं, स्थानीयता का उपयोग करती हैं और कार्य को गतिशील रूप "
        "से बाँटती हैं।"
    ),
    "mr": (
        "गावातील जुना बाजार नदीजवळ भरत असे आणि दर रविवारी तीच माणसं "
        "भाजी व फळं घ्यायला येत असत. दुकानदार चहा घेत हवामानाच्या आणि "
        "पिकांच्या गप्पा मारत असत. हिवाळ्यात धुकं उशिरापर्यंत "
        "गल्ल्यांमध्ये रेंगाळत असे आणि मुलं शाळेत जाताना हात चोळत असत. "
        "संध्याकाळी दिवे लागले की सगळा गाव शांत आणि साधा वाटत असे. "
        "कोणालाही घाई नव्हती कारण सगळे एकमेकांना अनेक वर्षांपासून ओळखत "
        "होते. वेळ मिळाला की म्हातारी माणसं देवळाजवळ बसून जुन्या आठवणी "
        "सांगत असत. "
        "आधुनिक संगणकीय प्रणाली माहितीवर अमूर्ततेच्या अनेक "
        "पातळ्यांमधून प्रक्रिया करतात. वितरित क्वेरी इंजिन प्रचंड डेटा "
        "संच अनेक यंत्रांमध्ये वाटतो, गाळण्या आणि एकत्रीकरण समांतर "
        "चालवतो आणि नंतर आंशिक निकाल जोडतो. संशोधक थ्रूपुट आणि विलंब "
        "काळजीपूर्वक मोजतात कारण कामगिरी गणनेपेक्षा डेटाच्या हालचालीवर "
        "अवलंबून असते. कार्यक्षम अल्गोरिदम जाळ्यावरील वाहतूक कमी करतात, "
        "स्थानिकतेचा वापर करतात आणि काम गतिमानपणे वाटून देतात."
    ),
    "ne": (
        "पुरानो बजार सहरको बीचमा थियो र हरेक बिहान उही मानिसहरू तरकारी "
        "र फलफूल किन्न आउँथे। पसलेहरू चिया पिउँदै मौसम र बालीको कुरा "
        "गर्थे। जाडोमा कुहिरो धेरै बेरसम्म गल्लीहरूमा अडिन्थ्यो र "
        "केटाकेटीहरू विद्यालय जाँदा हात माड्थे। साँझ परेपछि बत्ती बल्दा "
        "सिङ्गो टोल शान्त र सरल देखिन्थ्यो। कसैलाई हतार थिएन किनभने "
        "सबैले एकअर्कालाई धेरै वर्षदेखि चिनेका थिए। "
        "आधुनिक अभिकलन प्रणालीहरूले सूचनालाई अमूर्तताका धेरै तहहरूबाट "
        "प्रशोधन गर्छन्। वितरित क्वेरी इन्जिनले विशाल डेटा समूहहरूलाई "
        "धेरै मेसिनहरूमा बाँड्छ, फिल्टर र समुच्चय समानान्तर चलाउँछ र "
        "त्यसपछि आंशिक नतिजाहरू जोड्छ। अनुसन्धानकर्ताहरूले प्रवाह "
        "क्षमता र विलम्बता ध्यानपूर्वक नाप्छन् किनभने कार्यसम्पादन "
        "गणनाभन्दा डेटाको आवागमनमा बढी निर्भर हुन्छ। कुशल "
        "एल्गोरिदमहरूले सञ्जाल यातायात घटाउँछन्, स्थानीयता प्रयोग "
        "गर्छन् र कामलाई गतिशील रूपमा बाँड्छन्।"
    ),
}
DEV_LANGS = tuple(DEVANAGARI_CORPORA)
_DEV_LOGP, _DEV_OOV = build_profiles(corpora=DEVANAGARI_CORPORA)
MARATHI_LLA = "ळ"  # U+0933


def classify_devanagari_py(text: str) -> str:
    """Scalar reference for the Devanagari tier (tests pin the Spark
    operator against this): ळ presence -> 'mr' (orthography fact),
    else the trigram NB over the hi/mr/ne overlap."""
    if text is None or not text.strip():
        return "unknown"
    if MARATHI_LLA in text:
        return "mr"
    scores = [0.0] * len(DEV_LANGS)
    for tg in char_trigrams(text):
        row = _DEV_LOGP.get(tg, _DEV_OOV)
        for j in range(len(DEV_LANGS)):
            scores[j] += row[j]
    best = max(range(len(DEV_LANGS)), key=lambda j: (scores[j], -j))
    return DEV_LANGS[best]


def lang_id_devanagari(
    df: DataFrame,
    text_col: str,
    id_col: str,
    carry: list[str] | None = None,
    spread: bool = True,
) -> DataFrame:
    """(id, pred_lang, n_trigrams, margin, score_hi/mr/ne) — the
    per-script model downstream of the 'hi' branch, mirroring
    lang_id_cjk: the ळ presence branch decides 'mr' first
    (orthography fact, zero model risk), and the trigram NB over
    DEVANAGARI_CORPORA separates the remaining hi/mr/ne overlap by
    verb morphology and function words. Same Arrow-batched
    sequential left-fold as the Latin flagship (bit-identical to the
    oracle's list_reduce), zero shuffles; the presence count is a
    JVM regexp expression."""
    from python_plugins_spark.sources.io import spread_scan

    carry = [c for c in (carry or []) if c != id_col]
    if spread:
        df = spread_scan(df)  # §2.5 — no-op on already-parallel inputs
    logp, oov, nl = _DEV_LOGP, _DEV_OOV, len(DEV_LANGS)

    idx_map, mat = _profile_matrix(logp, oov)

    @F.pandas_udf("array<double>")
    def _score(col: pd.Series) -> pd.Series:
        out = []
        for text in col:
            tgs = (
                char_trigrams(text)
                if text is not None and text.strip()
                else []
            )
            out.append([float(len(tgs))] + _fold_scores(tgs, idx_map, mat))
        return pd.Series(out)

    d = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.col(text_col).alias("_t"),
        _score(F.col(text_col)).alias("_r"),
    ).select(
        id_col, *carry, "_t",
        F.element_at("_r", 1).cast("long").alias("n_trigrams"),
        F.slice("_r", 2, nl).alias("_sc"),
    )
    sc = {lang: F.element_at("_sc", j + 1) for j, lang in enumerate(DEV_LANGS)}
    best = F.lit(None).cast("string")
    for j in range(nl - 1, -1, -1):
        lang = DEV_LANGS[j]
        others = [sc[o] for o in DEV_LANGS if o != lang]
        best = F.when(sc[lang] >= F.greatest(*others), F.lit(lang)).otherwise(best)
    n_lla = F.length(
        F.regexp_replace(F.col("_t"), f"[^{MARATHI_LLA}]", "")
    )
    pred = (
        F.when(F.col("n_trigrams") == 0, F.lit("unknown"))
        .when(n_lla > 0, F.lit("mr"))
        .otherwise(best)
    )
    srt = F.sort_array("_sc", asc=False)
    margin = F.when(
        F.col("n_trigrams") > 0,
        (F.element_at(srt, 1) - F.element_at(srt, 2))
        / F.col("n_trigrams").cast("double"),
    ).otherwise(F.lit(0.0))
    return d.select(
        id_col,
        *carry,
        pred.alias("pred_lang"),
        "n_trigrams",
        F.round(margin, 6).alias("margin"),
        *[F.round(sc[lang], 4).alias(f"score_{lang}") for lang in DEV_LANGS],
    )


def lang_id_devanagari_oracle_sql(
    table: str, text_col: str, id_col: str
) -> str:
    """DuckDB twin of lang_id_devanagari: same MAP literal, same
    trigram windows, same LEFT fold, same ळ presence branch —
    bit-identical score sums (the CJK oracle's structure with one
    presence class)."""
    from python_plugins_spark.functions import oracle_fragments as O

    nl = len(DEV_LANGS)
    map_entries = ", ".join(
        f"'{_sql_q(tg)}': [{', '.join(repr(x) for x in row)}]::DOUBLE[]"
        for tg, row in sorted(_DEV_LOGP.items())
    )
    oov = f"[{', '.join(repr(x) for x in _DEV_OOV)}]::DOUBLE[]"
    zero = f"[{', '.join('0.0' for _ in DEV_LANGS)}]::DOUBLE[]"
    add = ", ".join(f"a[{j + 1}] + b[{j + 1}]" for j in range(nl))
    norm = O.sql_norm_text(text_col)
    c_lla = (
        "length(regexp_replace(_t, "
        f"'[^\\x{{{ord(MARATHI_LLA):04x}}}]', '', 'g'))"
    )
    sel_scores = ", ".join(
        f"round(sc[{j + 1}], 4) AS score_{lang}"
        for j, lang in enumerate(DEV_LANGS)
    )
    best = "NULL"
    for j in range(nl - 1, -1, -1):
        lang = DEV_LANGS[j]
        others = ", ".join(
            f"sc[{i + 1}]" for i, o in enumerate(DEV_LANGS) if o != lang
        )
        best = (
            f"CASE WHEN sc[{j + 1}] >= greatest({others}) "
            f"THEN '{lang}' ELSE {best} END"
        )
    return f"""
    WITH pad AS (
      SELECT {id_col}, {text_col} AS _t,
             ' ' || {norm} || ' ' AS p
      FROM {table}
    ),
    tg AS (
      SELECT {id_col}, _t,
             CASE WHEN p IS NULL OR length(p) < 3 THEN []::VARCHAR[]
                  ELSE list_transform(range(1, length(p) - 1),
                                      i -> substr(p, i, 3)) END AS tgs
      FROM pad
    ),
    sc AS (
      SELECT {id_col}, _t, len(tgs)::BIGINT AS n_trigrams,
             list_reduce(
               list_prepend({zero},
                 list_transform(tgs,
                   t -> coalesce(_m[t][1], {oov}))),
               (a, b) -> [{add}]) AS sc
      FROM tg CROSS JOIN (SELECT MAP {{{map_entries}}} AS _m)
    )
    SELECT {id_col},
           CASE WHEN n_trigrams = 0 THEN 'unknown'
                WHEN {c_lla} > 0 THEN 'mr'
                ELSE {best} END AS pred_lang,
           n_trigrams,
           CASE WHEN n_trigrams > 0 THEN
             round((list_sort(sc, 'DESC')[1] - list_sort(sc, 'DESC')[2])
                   / n_trigrams::DOUBLE, 6)
           ELSE 0.0 END AS margin,
           {sel_scores}
    FROM sc
    """


# ---------------------------------------------------------- tiered
def lang_id_tiered(
    df: DataFrame,
    text_col: str,
    id_col: str,
    carry: list[str] | None = None,
) -> DataFrame:
    """(id, lang, tier) — the PRODUCTION composition of the whole
    lang-id family: the flagship trigram classifier with the
    ten-script branch runs over every document ONCE (text carried
    through its narrow projection, never a join-back), then each
    script-level verdict that has a downstream tier is REFINED on
    just its routed subset: 'ru' -> the Cyrillic trigram tier
    (ru/uk/bg), 'zh'/'ja'/'ko' -> the CJK tier (presence branch +
    Han-overlap trigrams), 'ar' -> the Arabic-script repertoire tier
    (ar/fa/ur), 'hi' -> the Devanagari tier (ळ presence + hi/mr/ne
    trigrams). Latin verdicts, single-language scripts (el/he/th),
    and 'unknown' stand as-is ('base' tier).

    Scale shape: the base pass is the zero-shuffle Arrow map; its
    output is materialized once (localCheckpoint — five consumers
    would otherwise re-run the scoring pass per branch) and each tier
    is another zero-shuffle narrow map over its subset; the final
    result is a UNION, not a join. Total corpus passes: 1 + the
    routed fractions. ``carry`` lists extra input columns to pass
    through every branch (the pipeline stage carries the whole row
    this way); ``text_col`` itself MAY be carried — include it in
    ``carry`` and the verdict rows keep their text, matching the
    non-tiered path's carry contract."""
    carry = [c for c in (carry or []) if c != id_col]
    if set(carry) & {"lang", "tier"}:
        # the output verdict columns — a silent duplicate alias would
        # shadow one side; refuse loudly, the module convention
        raise ValueError(
            "lang_id_tiered: carried columns may not be named "
            "'lang' or 'tier' (the verdict columns); rename them first"
        )
    in_parts = (
        df.sparkSession.sparkContext.defaultParallelism
        if df.isStreaming
        else df.rdd.getNumPartitions()
    )
    base = lang_id_ngram(
        df, text_col, id_col,
        carry=[text_col] + [c for c in carry if c != text_col],
    )
    base = base.transform(stage_checkpoint)
    if not df.isStreaming and in_parts < base.rdd.getNumPartitions():
        # the scorer's spread_scan widened a small input so the heavy
        # base pass used the cluster; but SIX downstream consumers
        # (five tier branches + rest) each schedule one job over this
        # checkpointed frame, and near-empty defaultParallelism-wide
        # jobs cost more than they parallelize (measured: tiered 5.27 s
        # min spread-only vs 3.62 s unspread at sf0.1). Coalescing the
        # MATERIALIZED blocks back to the input's own width is narrow
        # (no second shuffle) and keeps the base pass parallel. At
        # corpus scale the input is already >= cluster width, nothing
        # fires, and every branch keeps full parallelism.
        base = base.coalesce(max(1, in_parts))
    routed = ("ru", "zh", "ja", "ko", "ar", "hi")
    rest = base.filter(~F.col("pred_lang").isin(*routed)).select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.col("pred_lang").alias("lang"),
        F.lit("base").alias("tier"),
    )
    cyr = lang_id_cyrillic(
        base.filter(F.col("pred_lang") == "ru"), text_col, id_col,
        carry=carry, spread=False,
    ).select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.col("pred_lang").alias("lang"),
        F.lit("cyrillic").alias("tier"),
    )
    cjk = lang_id_cjk(
        base.filter(F.col("pred_lang").isin("zh", "ja", "ko")),
        text_col,
        id_col,
        carry=carry, spread=False,
    ).select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.col("pred_lang").alias("lang"),
        F.lit("cjk").alias("tier"),
    )
    ara = lang_id_arabic_script(
        base.filter(F.col("pred_lang") == "ar"), text_col, id_col,
        carry=carry,
    ).select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.col("pred_lang").alias("lang"),
        F.lit("arabic-script").alias("tier"),
    )
    dev = lang_id_devanagari(
        base.filter(F.col("pred_lang") == "hi"), text_col, id_col,
        carry=carry, spread=False,
    ).select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.col("pred_lang").alias("lang"),
        F.lit("devanagari").alias("tier"),
    )
    return (
        rest.unionByName(cyr)
        .unionByName(cjk)
        .unionByName(ara)
        .unionByName(dev)
    )


def lang_id_tiered_oracle_sql(table: str, text_col: str, id_col: str) -> str:
    """DuckDB twin: the base oracle and each tier oracle nest as
    WITH-inside-CTE blocks (their internal CTE names cannot collide),
    routed subsets re-join the source table for their text, and the
    final UNION mirrors the Spark composition."""
    base = lang_id_ngram_oracle_sql(table, text_col, id_col)
    cyr = lang_id_cyrillic_oracle_sql("_ru_in", text_col, id_col)
    cjk = lang_id_cjk_oracle_sql("_cjk_in", text_col, id_col)
    ara = lang_id_arabic_script_oracle_sql("_ar_in", text_col, id_col)
    dev = lang_id_devanagari_oracle_sql("_hi_in", text_col, id_col)
    return f"""
    WITH _base AS ({base}),
    _ru_in AS (
      SELECT t.{id_col}, t.{text_col} FROM {table} t
      JOIN _base b ON t.{id_col} = b.{id_col} WHERE b.pred_lang = 'ru'
    ),
    _cjk_in AS (
      SELECT t.{id_col}, t.{text_col} FROM {table} t
      JOIN _base b ON t.{id_col} = b.{id_col}
      WHERE b.pred_lang IN ('zh', 'ja', 'ko')
    ),
    _ar_in AS (
      SELECT t.{id_col}, t.{text_col} FROM {table} t
      JOIN _base b ON t.{id_col} = b.{id_col} WHERE b.pred_lang = 'ar'
    ),
    _hi_in AS (
      SELECT t.{id_col}, t.{text_col} FROM {table} t
      JOIN _base b ON t.{id_col} = b.{id_col} WHERE b.pred_lang = 'hi'
    ),
    _cyr AS ({cyr}),
    _cjk AS ({cjk}),
    _ara AS ({ara}),
    _dev AS ({dev})
    SELECT {id_col}, pred_lang AS lang, 'base' AS tier
    FROM _base WHERE pred_lang NOT IN ('ru', 'zh', 'ja', 'ko', 'ar', 'hi')
    UNION ALL
    SELECT {id_col}, pred_lang AS lang, 'cyrillic' AS tier FROM _cyr
    UNION ALL
    SELECT {id_col}, pred_lang AS lang, 'cjk' AS tier FROM _cjk
    UNION ALL
    SELECT {id_col}, pred_lang AS lang, 'arabic-script' AS tier FROM _ara
    UNION ALL
    SELECT {id_col}, pred_lang AS lang, 'devanagari' AS tier FROM _dev
    """
