"""Built-in multilingual fixture corpus for NgramLanguageIdentifier.

Deterministic, self-contained sample text in 30 languages, composed for
this package from everyday vocabulary (no external corpus shipped in
this environment). Character-n-gram profiles learned from TRAIN separate
the languages well because the samples lean on each language's function
words and orthography; HOLDOUT sentences are disjoint from TRAIN and are
used by the accuracy invariants (tests/test_llm_ops.py and the lang_id
correctness member).

A production deployment would fit the same operator on a real labeled
corpus (e.g. Tatoeba / OSCAR slices); the operator's fit path is the
same distributed aggregation either way — this module only supplies a
default so language ID works out of the box.
"""

from __future__ import annotations

TRAIN: dict[str, list[str]] = {
    "ar": [
        "هذا الكتاب الجديد موجود على الطاولة في الغرفة الكبيرة بجانب النافذة المفتوحة",
        "ذهبت إلى السوق في الصباح واشتريت الخبز والحليب والفواكه الطازجة لعائلتي",
        "اللغة العربية من أكثر اللغات انتشارا في العالم ويتحدث بها ملايين الناس",
        "نحن نحب القراءة والكتابة والتعلم في المدرسة مع الأصدقاء كل يوم من أيام الأسبوع",
    ],
    "bg": [
        "днес времето е много хубаво и слънцето грее над целия град от ранна сутрин",
        "бих искал да купя хляб и мляко от магазина близо до нашата къща",
        "българският език се говори от милиони хора и има дълга писмена история",
        "децата играят в парка следобед и след това се прибират вкъщи за вечеря",
    ],
    "cs": [
        "dnes je krásné počasí a slunce svítí nad celým městem už od rána",
        "chtěl bych si koupit chleba a mléko v obchodě vedle našeho domu",
        "čeština je západoslovanský jazyk kterým mluví přibližně deset milionů lidí",
        "děti si odpoledne hrají v parku a potom jdou domů na večeři se svými rodiči",
    ],
    "da": [
        "i dag er vejret meget smukt og solen skinner over hele byen fra morgenstunden",
        "jeg vil gerne købe brød og mælk i butikken ved siden af vores hus",
        "dansk tales af omkring seks millioner mennesker og hører til de nordiske sprog",
        "børnene leger i parken om eftermiddagen og bagefter går de hjem til aftensmad",
    ],
    "de": [
        "heute ist das wetter sehr schön und die sonne scheint schon seit dem frühen morgen über der ganzen stadt",
        "ich möchte gerne brot und milch in dem geschäft neben unserem haus kaufen",
        "die deutsche sprache wird von ungefähr hundert millionen menschen gesprochen",
        "die kinder spielen nachmittags im park und danach gehen sie nach hause zum abendessen",
    ],
    "el": [
        "σήμερα ο καιρός είναι πολύ ωραίος και ο ήλιος λάμπει πάνω από την πόλη από το πρωί",
        "θα ήθελα να αγοράσω ψωμί και γάλα από το μαγαζί δίπλα στο σπίτι μας",
        "η ελληνική γλώσσα έχει μακρά ιστορία και μιλιέται από εκατομμύρια ανθρώπους",
        "τα παιδιά παίζουν στο πάρκο το απόγευμα και μετά πηγαίνουν σπίτι για βραδινό",
    ],
    "en": [
        "today the weather is very beautiful and the sun has been shining over the whole city since early morning",
        "i would like to buy some bread and milk from the shop next to our house",
        "the english language is spoken by hundreds of millions of people around the world",
        "the children play in the park in the afternoon and then they go home for dinner with their parents",
    ],
    "es": [
        "hoy el tiempo es muy hermoso y el sol brilla sobre toda la ciudad desde la mañana",
        "me gustaría comprar pan y leche en la tienda que está al lado de nuestra casa",
        "el idioma español es hablado por cientos de millones de personas en el mundo",
        "los niños juegan en el parque por la tarde y después van a casa para cenar con sus padres",
    ],
    "fa": [
        "امروز هوا بسیار زیبا است و خورشید از صبح زود بر تمام شهر می تابد",
        "می خواهم از فروشگاه کنار خانه ما نان و شیر بخرم",
        "زبان فارسی تاریخ ادبی طولانی دارد و میلیون ها نفر به آن صحبت می کنند",
        "بچه ها بعد از ظهر در پارک بازی می کنند و سپس برای شام به خانه می روند",
    ],
    "fi": [
        "tänään sää on erittäin kaunis ja aurinko on paistanut koko kaupungin yllä aamusta asti",
        "haluaisin ostaa leipää ja maitoa kaupasta joka on meidän talomme vieressä",
        "suomen kieltä puhuu noin viisi miljoonaa ihmistä ja se kuuluu suomalais ugrilaisiin kieliin",
        "lapset leikkivät puistossa iltapäivällä ja sen jälkeen he menevät kotiin syömään illallista",
    ],
    "fr": [
        "aujourd'hui le temps est très beau et le soleil brille sur toute la ville depuis le matin",
        "je voudrais acheter du pain et du lait dans le magasin à côté de notre maison",
        "la langue française est parlée par des centaines de millions de personnes dans le monde",
        "les enfants jouent dans le parc l'après midi et ensuite ils rentrent à la maison pour le dîner",
    ],
    "he": [
        "היום מזג האוויר יפה מאוד והשמש זורחת מעל כל העיר מאז הבוקר המוקדם",
        "אני רוצה לקנות לחם וחלב בחנות שנמצאת ליד הבית שלנו",
        "השפה העברית היא שפה עתיקה מאוד ומדוברת על ידי מיליוני אנשים",
        "הילדים משחקים בפארק אחר הצהריים ואחר כך הולכים הביתה לארוחת ערב",
    ],
    "hi": [
        "आज मौसम बहुत सुंदर है और सूरज सुबह से पूरे शहर पर चमक रहा है",
        "मैं अपने घर के पास की दुकान से रोटी और दूध खरीदना चाहता हूँ",
        "हिंदी भाषा करोड़ों लोगों द्वारा बोली जाती है और इसका लंबा इतिहास है",
        "बच्चे दोपहर में पार्क में खेलते हैं और फिर रात के खाने के लिए घर जाते हैं",
    ],
    "hu": [
        "ma nagyon szép az idő és a nap már kora reggel óta süt az egész város felett",
        "szeretnék kenyeret és tejet venni a házunk melletti boltban",
        "a magyar nyelvet körülbelül tizenhárom millió ember beszéli a világon",
        "a gyerekek délután a parkban játszanak és utána hazamennek vacsorázni a szüleikkel",
    ],
    "id": [
        "hari ini cuaca sangat indah dan matahari bersinar di atas seluruh kota sejak pagi",
        "saya ingin membeli roti dan susu di toko yang ada di sebelah rumah kami",
        "bahasa indonesia digunakan oleh ratusan juta orang di seluruh nusantara",
        "anak anak bermain di taman pada sore hari dan kemudian mereka pulang untuk makan malam",
    ],
    "it": [
        "oggi il tempo è molto bello e il sole splende su tutta la città fin dal mattino",
        "vorrei comprare del pane e del latte nel negozio accanto alla nostra casa",
        "la lingua italiana è parlata da circa sessanta milioni di persone nel mondo",
        "i bambini giocano nel parco nel pomeriggio e poi tornano a casa per la cena con i genitori",
    ],
    "ja": [
        "今日は天気がとても良くて朝から太陽が町全体を照らしています",
        "家の隣の店でパンと牛乳を買いたいと思います",
        "日本語は一億人以上の人々によって話されている言語です",
        "子供たちは午後に公園で遊んでそれから夕食のために家に帰ります",
    ],
    "ko": [
        "오늘은 날씨가 매우 좋고 아침부터 해가 도시 전체를 비추고 있습니다",
        "집 옆에 있는 가게에서 빵과 우유를 사고 싶습니다",
        "한국어는 칠천만 명이 넘는 사람들이 사용하는 언어입니다",
        "아이들은 오후에 공원에서 놀고 그 다음에 저녁을 먹으러 집에 갑니다",
    ],
    "nl": [
        "vandaag is het weer erg mooi en de zon schijnt al sinds de vroege ochtend over de hele stad",
        "ik wil graag brood en melk kopen in de winkel naast ons huis",
        "de nederlandse taal wordt door ongeveer vierentwintig miljoen mensen gesproken",
        "de kinderen spelen in de middag in het park en daarna gaan ze naar huis voor het avondeten",
    ],
    "no": [
        "i dag er været veldig fint og solen skinner over hele byen fra tidlig om morgenen",
        "jeg vil gjerne kjøpe brød og melk i butikken ved siden av huset vårt",
        "norsk snakkes av omtrent fem millioner mennesker og hører til de nordiske språkene",
        "barna leker i parken om ettermiddagen og etterpå går de hjem til middag med foreldrene sine",
    ],
    "pl": [
        "dzisiaj pogoda jest bardzo piękna i słońce świeci nad całym miastem od rana",
        "chciałbym kupić chleb i mleko w sklepie obok naszego domu",
        "język polski jest używany przez około czterdzieści milionów ludzi na świecie",
        "dzieci bawią się w parku po południu a potem idą do domu na kolację z rodzicami",
    ],
    "pt": [
        "hoje o tempo está muito bonito e o sol brilha sobre toda a cidade desde a manhã",
        "eu gostaria de comprar pão e leite na loja ao lado da nossa casa",
        "a língua portuguesa é falada por centenas de milhões de pessoas no mundo",
        "as crianças brincam no parque à tarde e depois vão para casa jantar com os pais",
    ],
    "ro": [
        "astăzi vremea este foarte frumoasă și soarele strălucește peste întregul oraș de dimineață",
        "aș vrea să cumpăr pâine și lapte de la magazinul de lângă casa noastră",
        "limba română este vorbită de aproximativ douăzeci și patru de milioane de oameni",
        "copiii se joacă în parc după amiaza și apoi merg acasă la cină cu părinții lor",
    ],
    "ru": [
        "сегодня погода очень красивая и солнце светит над всем городом с раннего утра",
        "я хотел бы купить хлеб и молоко в магазине рядом с нашим домом",
        "русский язык является одним из самых распространённых языков в мире",
        "дети играют в парке после обеда а потом идут домой ужинать вместе с родителями",
    ],
    "sv": [
        "idag är vädret mycket vackert och solen skiner över hela staden sedan tidigt på morgonen",
        "jag skulle vilja köpa bröd och mjölk i affären bredvid vårt hus",
        "svenska talas av ungefär tio miljoner människor och hör till de nordiska språken",
        "barnen leker i parken på eftermiddagen och efteråt går de hem för att äta middag",
    ],
    "th": [
        "วันนี้อากาศดีมากและดวงอาทิตย์ส่องแสงเหนือเมืองทั้งเมืองตั้งแต่เช้า",
        "ฉันอยากซื้อขนมปังและนมที่ร้านข้างบ้านของเรา",
        "ภาษาไทยเป็นภาษาที่มีผู้พูดหลายสิบล้านคนและมีประวัติศาสตร์ยาวนาน",
        "เด็กๆเล่นในสวนสาธารณะตอนบ่ายแล้วกลับบ้านไปกินข้าวเย็นกับครอบครัว",
    ],
    "tr": [
        "bugün hava çok güzel ve güneş sabahtan beri bütün şehrin üzerinde parlıyor",
        "evimizin yanındaki dükkandan ekmek ve süt almak istiyorum",
        "türkçe dünyada yaklaşık seksen milyon kişi tarafından konuşulan bir dildir",
        "çocuklar öğleden sonra parkta oynuyorlar ve sonra akşam yemeği için eve gidiyorlar",
    ],
    "uk": [
        "сьогодні погода дуже гарна і сонце світить над усім містом із самого ранку",
        "я хотів би купити хліб і молоко в крамниці поруч із нашим будинком",
        "українська мова має довгу історію і нею розмовляють десятки мільйонів людей",
        "діти граються в парку після обіду а потім ідуть додому вечеряти разом із батьками",
    ],
    "vi": [
        "hôm nay thời tiết rất đẹp và mặt trời chiếu sáng trên toàn thành phố từ sáng sớm",
        "tôi muốn mua bánh mì và sữa ở cửa hàng bên cạnh nhà chúng tôi",
        "tiếng việt được hàng chục triệu người sử dụng và có lịch sử lâu đời",
        "trẻ em chơi trong công viên vào buổi chiều và sau đó về nhà ăn tối cùng gia đình",
    ],
    "zh": [
        "今天天气非常好太阳从早上开始就照耀着整个城市",
        "我想在我们家旁边的商店买面包和牛奶",
        "汉语是世界上使用人数最多的语言之一有着悠久的历史",
        "孩子们下午在公园里玩耍然后回家和父母一起吃晚饭",
    ],
}

HOLDOUT: dict[str, list[str]] = {
    "ar": [
        "في المساء نجلس معا في البيت ونشرب الشاي ونتحدث عن أحداث اليوم الطويل",
        "المدينة القديمة جميلة جدا وفيها أسواق كثيرة ومساجد تاريخية يزورها الناس",
    ],
    "bg": [
        "вечерта седим заедно у дома пием чай и говорим за изминалия дълъг ден",
        "старият град е много красив и има много пазари и исторически сгради",
    ],
    "cs": [
        "večer sedíme spolu doma pijeme čaj a povídáme si o dlouhém uplynulém dni",
        "staré město je velmi krásné a je v něm mnoho trhů a historických budov",
    ],
    "da": [
        "om aftenen sidder vi sammen derhjemme drikker te og taler om den lange dag",
        "den gamle bydel er meget smuk og har mange markeder og historiske bygninger",
    ],
    "de": [
        "am abend sitzen wir zusammen zu hause trinken tee und sprechen über den langen tag",
        "die altstadt ist sehr schön und hat viele märkte und historische gebäude",
    ],
    "el": [
        "το βράδυ καθόμαστε μαζί στο σπίτι πίνουμε τσάι και μιλάμε για τη μεγάλη μέρα",
        "η παλιά πόλη είναι πολύ όμορφη και έχει πολλές αγορές και ιστορικά κτίρια",
    ],
    "en": [
        "in the evening we sit together at home drinking tea and talking about the long day",
        "the old town is very beautiful and has many markets and historical buildings to visit",
    ],
    "es": [
        "por la noche nos sentamos juntos en casa tomamos té y hablamos del largo día",
        "la ciudad vieja es muy bonita y tiene muchos mercados y edificios históricos",
    ],
    "fa": [
        "شب ها با هم در خانه می نشینیم چای می نوشیم و درباره روز طولانی صحبت می کنیم",
        "شهر قدیمی بسیار زیبا است و بازارهای زیاد و ساختمان های تاریخی دارد",
    ],
    "fi": [
        "illalla istumme yhdessä kotona juomme teetä ja puhumme pitkästä päivästä",
        "vanha kaupunki on hyvin kaunis ja siellä on monia toreja ja historiallisia rakennuksia",
    ],
    "fr": [
        "le soir nous nous asseyons ensemble à la maison buvons du thé et parlons de la longue journée",
        "la vieille ville est très belle et possède beaucoup de marchés et de bâtiments historiques",
    ],
    "he": [
        "בערב אנחנו יושבים יחד בבית שותים תה ומדברים על היום הארוך שעבר",
        "העיר העתיקה יפה מאוד ויש בה שווקים רבים ובניינים היסטוריים",
    ],
    "hi": [
        "शाम को हम घर पर साथ बैठते हैं चाय पीते हैं और लंबे दिन के बारे में बात करते हैं",
        "पुराना शहर बहुत सुंदर है और वहाँ कई बाज़ार और ऐतिहासिक इमारतें हैं",
    ],
    "hu": [
        "este együtt ülünk otthon teát iszunk és beszélgetünk a hosszú napról",
        "az óváros nagyon szép és sok piac valamint történelmi épület található benne",
    ],
    "id": [
        "pada malam hari kami duduk bersama di rumah minum teh dan berbicara tentang hari yang panjang",
        "kota tua itu sangat indah dan memiliki banyak pasar serta bangunan bersejarah",
    ],
    "it": [
        "la sera ci sediamo insieme a casa beviamo il tè e parliamo della lunga giornata",
        "la città vecchia è molto bella e ha molti mercati e edifici storici da visitare",
    ],
    "ja": [
        "夜には家で一緒に座ってお茶を飲みながら長い一日について話します",
        "旧市街はとても美しくて多くの市場や歴史的な建物があります",
    ],
    "ko": [
        "저녁에는 집에서 함께 앉아 차를 마시며 긴 하루에 대해 이야기합니다",
        "구시가지는 매우 아름답고 많은 시장과 역사적인 건물들이 있습니다",
    ],
    "nl": [
        "s avonds zitten we samen thuis drinken thee en praten over de lange dag",
        "de oude stad is erg mooi en heeft veel markten en historische gebouwen",
    ],
    "no": [
        "om kvelden sitter vi sammen hjemme drikker te og snakker om den lange dagen",
        "gamlebyen er veldig vakker og har mange markeder og historiske bygninger",
    ],
    "pl": [
        "wieczorem siedzimy razem w domu pijemy herbatę i rozmawiamy o długim dniu",
        "stare miasto jest bardzo piękne i ma wiele targów oraz zabytkowych budynków",
    ],
    "pt": [
        "à noite sentamos juntos em casa bebemos chá e conversamos sobre o longo dia",
        "a cidade velha é muito bonita e tem muitos mercados e edifícios históricos",
    ],
    "ro": [
        "seara stăm împreună acasă bem ceai și vorbim despre ziua lungă care a trecut",
        "orașul vechi este foarte frumos și are multe piețe și clădiri istorice",
    ],
    "ru": [
        "вечером мы сидим вместе дома пьём чай и разговариваем о прошедшем длинном дне",
        "старый город очень красивый и в нём много рынков и исторических зданий",
    ],
    "sv": [
        "på kvällen sitter vi tillsammans hemma dricker te och pratar om den långa dagen",
        "gamla stan är mycket vacker och har många marknader och historiska byggnader",
    ],
    "th": [
        "ตอนเย็นเรานั่งด้วยกันที่บ้านดื่มชาและพูดคุยเกี่ยวกับวันอันยาวนาน",
        "เมืองเก่าสวยงามมากและมีตลาดมากมายรวมทั้งอาคารประวัติศาสตร์",
    ],
    "tr": [
        "akşamları evde birlikte oturuyoruz çay içiyoruz ve uzun günden bahsediyoruz",
        "eski şehir çok güzel ve birçok pazar ile tarihi bina bulunuyor",
    ],
    "uk": [
        "увечері ми сидимо разом удома п'ємо чай і розмовляємо про довгий день",
        "старе місто дуже гарне і в ньому багато ринків та історичних будівель",
    ],
    "vi": [
        "vào buổi tối chúng tôi ngồi cùng nhau ở nhà uống trà và nói về một ngày dài",
        "khu phố cổ rất đẹp và có nhiều chợ cùng những tòa nhà lịch sử",
    ],
    "zh": [
        "晚上我们一起坐在家里喝茶谈论漫长的一天",
        "老城区非常漂亮有很多市场和历史建筑",
    ],
}

LANGS: list[str] = sorted(TRAIN)


def fixture_df(spark, which: str = "train"):
    """(lang, text) DataFrame of the built-in fixture corpus, carried
    in ONE partition: every scan of a default-parallelized local
    relation costs one Python-worker roundtrip per slice (32 near-empty
    tasks per action at local[32]), and the fixture is ~120 rows."""
    from .frames import one_slice_frame

    data = TRAIN if which == "train" else HOLDOUT
    rows = [(lang, t) for lang in sorted(data) for t in data[lang]]
    return one_slice_frame(spark, rows, "lang string, text string")
