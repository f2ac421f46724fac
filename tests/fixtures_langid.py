"""Multi-language natural-prose fixture set for language-ID accuracy.

Reference behavior being modeled: text_clean_and_filter.py:385-408 runs
langdetect per row and filters on min confidence 0.8. These sentences are
ordinary prose (news-register, original compositions — not quotes from any
corpus) covering every language the detector claims: the 7 Latin stopword
languages, the 2 alphabetic script languages with trigram blending (ru, el),
and the 4 script-only languages (zh, ja, ko, ar).
"""

# (label, text, expected_lang)
PROSE_CASES: list[tuple[str, str, str]] = [
    # --- English ---
    ("en1", "The committee published its annual report on renewable energy yesterday.", "en"),
    ("en2", "She walked along the river in the morning and watched the boats pass slowly by.", "en"),
    ("en3", "Officials said the new policy would take effect next month after a public review.", "en"),
    ("en4", "Most of the students had already finished their work before the bell rang.", "en"),
    # --- German ---
    ("de1", "Der Ausschuss veröffentlichte gestern seinen Jahresbericht über erneuerbare Energien.", "de"),
    ("de2", "Die Kinder spielten den ganzen Nachmittag im Garten und kamen erst am Abend zurück.", "de"),
    ("de3", "Nach der Sitzung erklärte die Ministerin, dass die neuen Regeln ab nächstem Jahr gelten.", "de"),
    ("de4", "Er hatte sich lange auf diese Reise gefreut und packte seine Sachen schon am Morgen.", "de"),
    # --- French ---
    ("fr1", "Le comité a publié hier son rapport annuel sur les énergies renouvelables.", "fr"),
    ("fr2", "Les enfants jouaient dans le jardin pendant que leurs parents préparaient le dîner.", "fr"),
    ("fr3", "Après la réunion, la ministre a expliqué que les nouvelles règles entreraient en vigueur.", "fr"),
    ("fr4", "Il marchait lentement le long de la rivière en regardant passer les bateaux.", "fr"),
    # --- Spanish ---
    ("es1", "El comité publicó ayer su informe anual sobre las energías renovables.", "es"),
    ("es2", "Los niños jugaban en el jardín mientras sus padres preparaban la cena.", "es"),
    ("es3", "Después de la reunión, la ministra explicó que las nuevas reglas entrarían en vigor.", "es"),
    ("es4", "Caminaba despacio junto al río mirando pasar los barcos durante la tarde.", "es"),
    # --- Italian ---
    ("it1", "Il comitato ha pubblicato ieri il suo rapporto annuale sulle energie rinnovabili.", "it"),
    ("it2", "I bambini giocavano in giardino mentre i genitori preparavano la cena per tutti.", "it"),
    ("it3", "Dopo la riunione, la ministra ha spiegato che le nuove regole entreranno in vigore.", "it"),
    ("it4", "Camminava lentamente lungo il fiume guardando passare le barche nel pomeriggio.", "it"),
    # --- Portuguese ---
    ("pt1", "O comitê publicou ontem o seu relatório anual sobre as energias renováveis.", "pt"),
    ("pt2", "As crianças brincavam no jardim enquanto os pais preparavam o jantar para todos.", "pt"),
    ("pt3", "Depois da reunião, a ministra explicou que as novas regras entrariam em vigor.", "pt"),
    ("pt4", "Ele caminhava devagar ao longo do rio olhando os barcos que passavam à tarde.", "pt"),
    # --- Dutch ---
    ("nl1", "De commissie publiceerde gisteren haar jaarverslag over hernieuwbare energie.", "nl"),
    ("nl2", "De kinderen speelden de hele middag in de tuin en kwamen pas tegen de avond terug.", "nl"),
    ("nl3", "Na de vergadering legde de minister uit dat de nieuwe regels volgend jaar gelden.", "nl"),
    ("nl4", "Hij liep langzaam langs de rivier en keek naar de boten die voorbij voeren.", "nl"),
    # --- Russian (Cyrillic script + trigram blend) ---
    ("ru1", "Комитет опубликовал вчера свой ежегодный доклад о возобновляемых источниках энергии.", "ru"),
    ("ru2", "Дети играли в саду весь день и вернулись домой только поздно вечером.", "ru"),
    ("ru3", "После заседания министр объяснила, что новые правила вступят в силу в следующем году.", "ru"),
    ("ru4", "Он медленно шёл вдоль реки и смотрел на лодки, которые проплывали мимо.", "ru"),
    # --- Greek (Greek script + trigram blend) ---
    ("el1", "Η επιτροπή δημοσίευσε χθες την ετήσια έκθεσή της για τις ανανεώσιμες πηγές ενέργειας.", "el"),
    ("el2", "Τα παιδιά έπαιζαν στον κήπο όλο το απόγευμα και γύρισαν σπίτι αργά το βράδυ.", "el"),
    ("el3", "Μετά τη συνεδρίαση η υπουργός εξήγησε ότι οι νέοι κανόνες θα ισχύσουν του χρόνου.", "el"),
    ("el4", "Περπατούσε αργά δίπλα στο ποτάμι και κοιτούσε τις βάρκες που περνούσαν.", "el"),
    # --- Chinese / Japanese / Korean / Arabic (script-range detection) ---
    ("zh1", "这是一个完整的中文句子，用来测试语言检测功能是否正常工作。", "zh"),
    ("zh2", "委员会昨天发布了关于可再生能源的年度报告，引起了广泛关注。", "zh"),
    ("ja1", "委員会は昨日、再生可能エネルギーに関する年次報告書を発表しました。", "ja"),
    ("ja2", "子どもたちは午後ずっと庭で遊んで、夕方になってから家に帰りました。", "ja"),
    ("ko1", "위원회는 어제 재생 가능 에너지에 관한 연례 보고서를 발표했습니다.", "ko"),
    ("ko2", "아이들은 오후 내내 정원에서 놀다가 저녁이 되어서야 집에 돌아왔습니다.", "ko"),
    ("ar1", "نشرت اللجنة أمس تقريرها السنوي حول مصادر الطاقة المتجددة في البلاد.", "ar"),
    ("ar2", "كان الأطفال يلعبون في الحديقة طوال المساء وعادوا إلى المنزل متأخرين.", "ar"),
]
