"""Per-language stopword sets for the `text` analyzer.

The reference resolves stopwords from per-locale word-list files under
IRS_RESOURCE_ROOT (`core/analysis/text_token_stream.cpp` — the
`stopwordsPath` option; one file of words per language). Shipping data
files is the same idea here: these are compact built-in defaults (the
high-frequency closed-class words of each language); callers with their
own curated lists pass them via the analyzer's `stopwords=` option,
which overrides these entirely.

Sets are keyed by ISO 639-1 code and applied AFTER lowercasing and NFC
normalization, BEFORE stemming — the reference's chain order.
"""

from __future__ import annotations

STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        """a an and are as at be but by for if in into is it no not of
        on or such that the their then there these they this to was
        will with""".split()
    ),
    "de": frozenset(
        """aber alle als also am an auch auf aus bei bin bis bist da
        damit dann das dass dein deine dem den der des dessen die dies
        diese dir doch dort du durch ein eine einem einen einer eines
        er es euer eure für hat hatte haben hier hinter ich ihr ihre im
        in ist ja jede jedem jeden jeder jedes jener jenes jetzt kann
        können mein meine mit muss musste nach nicht nichts noch nun
        nur ob oder ohne sehr sein seine sich sie sind so über um und
        uns unser unter vom von vor wann warum was weiter weitere wenn
        wer werde werden wie wieder will wir wird wirst wo woher wohin
        zu zum zur""".split()
    ),
    "fr": frozenset(
        """au aux avec ce ces dans de des du elle en et eux il ils je
        la le les leur lui ma mais me même mes moi mon ne nos notre
        nous on ou par pas pour qu que qui sa se ses son sur ta te tes
        toi ton tu un une vos votre vous c d j l à m n s t y été étée
        étées étés étant suis es est sommes êtes sont serai seras sera
        serons serez seront serais serait serions seriez seraient
        étais était étions étiez étaient fus fut fûmes fûtes furent
        sois soit soyons soyez soient fusse fusses fût fussions
        fussiez fussent ayant eu eue eues eus ai as avons avez ont
        aurai auras aura aurons aurez auront aurais aurait aurions
        auriez auraient avais avait avions aviez avaient eut eûmes
        eûtes eurent aie aies ait ayons ayez aient eusse eusses eût
        eussions eussiez eussent""".split()
    ),
    "es": frozenset(
        """de la que el en y a los del se las por un para con no una
        su al lo como más pero sus le ya o este sí porque esta entre
        cuando muy sin sobre también me hasta hay donde quien desde
        todo nos durante todos uno les ni contra otros ese eso ante
        ellos e esto mí antes algunos qué unos yo otro otras otra él
        tanto esa estos mucho quienes nada muchos cual poco ella estar
        estas algunas algo nosotros mi mis tú te ti tu tus ellas
        nosotras vosotros vosotras os mío mía míos mías tuyo tuya
        tuyos tuyas suyo suya suyos suyas nuestro nuestra nuestros
        nuestras vuestro vuestra vuestros vuestras esos esas estoy
        estás está estamos estáis están ser es soy eres somos sois son
        tengo tiene tenemos tienen era eran fue fueron ha han he hemos
        había habían sea sean siendo sido""".split()
    ),
    "pt": frozenset(
        """de a o que e do da em um para é com não uma os no se na por
        mais as dos como mas foi ao ele das tem à seu sua ou ser
        quando muito há nos já está eu também só pelo pela até isso
        ela entre era depois sem mesmo aos ter seus quem nas me esse
        eles estão você tinha foram essa num nem suas meu às minha têm
        numa pelos elas havia seja qual será nós tenho lhe deles essas
        esses pelas este fosse dele tu te vocês vos lhes meus minhas
        teu tua teus tuas nosso nossa nossos nossas dela delas esta
        estes estas aquele aquela aqueles aquelas isto aquilo estou
        estamos estava estivemos sou somos são era éramos eram fui foi
        fomos ser sendo sido""".split()
    ),
    "it": frozenset(
        """ad al allo ai agli alla alle con col coi da dal dallo dai
        dagli dalla dalle di del dello dei degli della delle in nel
        nello nei negli nella nelle su sul sullo sui sugli sulla sulle
        per tra contro io tu lui lei noi voi loro mio mia miei mie tuo
        tua tuoi tue suo sua suoi sue nostro nostra nostri nostre
        vostro vostra vostri vostre mi ti ci vi lo la li le gli ne il
        un uno una ma ed se perché anche come dov dove che chi cui non
        più quale quanto quanti quanta quante quello quelli quella
        quelle questo questi questa queste si tutto tutti a c e i l o
        ho hai ha abbiamo avete hanno abbia abbiate abbiano avrò sono
        sei è siamo siete sia siate siano sarò erano era ero fui fu
        essendo stato stata stati state""".split()
    ),
    "nl": frozenset(
        """de en van ik te dat die in een hij het niet zijn is was op
        aan met als voor had er maar om hem dan zou of wat mijn men
        dit zo door over ze zich bij ook tot je mij uit der daar haar
        naar heb hoe heeft hebben deze u want nog zal me zij nu ge
        geen omdat iets worden toch al waren veel meer doen toen moet
        ben zonder kan hun dus alles onder ja eens hier wie werd
        altijd doch wordt wezen kunnen ons zelf tegen na reeds wil
        kon niets uw iemand geweest andere""".split()
    ),
    "ru": frozenset(
        """и в во не что он на я с со как а то все она так его но да
        ты к у же вы за бы по только ее мне было вот от меня еще нет
        о из ему теперь когда даже ну вдруг ли если уже или ни быть
        был него до вас нибудь опять уж вам ведь там потом себя ничего
        ей может они тут где есть надо ней для мы тебя их чем была сам
        чтоб без будто чего раз тоже себе под будет ж тогда кто этот
        того потому этого какой совсем ним здесь этом один почти мой
        тем чтобы нее сейчас были куда зачем всех никогда можно при
        наконец два об другой хоть после над больше тот через эти нас
        про всего них какая много разве три эту моя впрочем хорошо
        свою этой перед иногда лучше чуть том нельзя такой им более
        всегда конечно всю между это""".split()
    ),
    "da": frozenset(
        """og i jeg det at en den til er som på de med han af for ikke
        der var mig sig men et har om vi min havde ham hun nu over da
        fra du ud sin dem os op man hans hvor eller hvad skal selv her
        alle vil blev kunne ind når være dog noget ville jo deres
        efter ned skulle denne end dette mit også under have dig anden
        hende mine alt meget sit sine vor mod disse hvis din nogle hos
        blive mange ad bliver hendes været thi jer sådan""".split()
    ),
    "no": frozenset(
        """og i jeg det at en et den til er som på de med han av ikke
        der så var meg seg men ett har om vi min mitt ha hadde hun nå
        over da ved fra du ut sin dem oss opp man kan hans hvor eller
        hva skal selv sjøl her alle vil bli ble blitt kunne inn når
        være kom noen noe ville dere som deres kun ja etter ned skulle
        denne for deg si sine sitt mot å meget hvorfor dette disse
        uten hvordan ingen din ditt blir samme hvilken hvilke sånn
        inni mellom vår hver hvem vors hvis både bare enn fordi før
        mange også slik vært""".split()
    ),
    "fi": frozenset(
        """ja on ei se että hän oli ole mutta niin kun myös joka jos
        mitä tai sitä tämä kuin vain hänen sen nyt siitä jo voi olla
        sekä näin sitten kuitenkin vielä kaikki me he ne minä sinä te
        mikä missä koska kanssa hyvin itse ilman jälkeen yli ennen
        paljon nämä noin kuten sillä eli mukaan jotka jonka heidän
        meidän olen olet olemme olette ovat olisi ollut olleet tässä
        tämän mihin miksi kuka ketä mistä siinä hänet minut sinut
        meitä heitä teitä niitä""".split()
    ),
    "hu": frozenset(
        """a az és hogy nem is egy van volt lesz ez azt el de meg ha
        már csak mint még mert vagy ki mi ő ők mik aki ami amely
        amelyek ezek azok itt ott hol mikor hogyan miért be fel le
        ide oda rá nál nél után előtt alatt felett között által
        ellen helyett nélkül óta való vannak voltak lenne lett lehet
        kell kellett minden mindig soha talán nagyon így úgy akkor
        most majd aztán pedig hanem sem se ne annak ennek arra erre
        abban ebben azzal ezzel attól ettől ahhoz ehhez ezért azért
        én te mi ti őket engem téged neki nekem neked vele velem""".split()
    ),
    "ro": frozenset(
        """și în a la cu de pe un o că este sunt pentru din nu se mai
        care ce al ale lui sau dar dacă când cum unde această
        acest acestei acestui el ea ei ele noi voi eu tu își să fi
        fie fost era erau au am ai are avea vor va după până între
        fără despre sub peste prin iar ori însă le îl îi ne vă mă te
        unei unui unor celor cel cea cei cele tot toate toți
        foarte atât același aceeași fiind către asupra""".split()
    ),
    "sv": frozenset(
        """och det att i en jag hon som han på den med var sig för så
        till är men ett om hade de av icke mig du henne då sin nu har
        inte hans honom skulle hennes där min man ej vid kunde något
        från ut när efter upp vi dem vara vad över än dig kan sina
        här ha mot alla under någon eller allt mycket sedan ju denna
        själv detta åt utan varit hur ingen mitt ni bli blev oss din
        dessa några deras blir mina samma vilken er sådan vår blivit
        dess inom mellan sådant varför varje vilka ditt vem vilket
        sitta sådana vart dina vars vårt våra ert era vilkas""".split()
    ),
    "tr": frozenset(
        """acaba altı ama ancak artık asla aslında az bana bazen bazı
        belki ben beni benim beri beş bile bir birçok biri birkaç
        birşey biz bize bizi bizim böyle böylece bu buna bunda bundan
        bunlar bunları bunun burada çok çünkü da daha de defa değil
        diğer diye dolayı elbette en fakat falan gibi göre hala hangi
        hatta hem henüz hep hepsi her herhangi herkes hiç hiçbir için
        içinde ile ilgili ise işte itibaren kadar karşın kendi kez ki
        kim kime kimin madem mi mı mu mü nasıl ne neden nedenle nerde
        nerede nereye niçin niye o olan olarak oldu olduğu olmak
        olması olur on ona ondan onlar onlara onlardan onların onu
        onun orada oysa öyle pek rağmen sana sen senden seni senin
        siz sizden sizi sizin son sonra şey şeyi şimdi şöyle şu şuna
        şunları şunu tarafından tüm üzere ve veya ya yani yerine yine
        yoksa zaten zira""".split()
    ),
    "id": frozenset(
        """ada adalah agar akan aku anda antara apa apakah atau bagi
        bahwa baik banyak beberapa begitu belum bisa bukan dalam dan
        dapat dari demi dengan di dia dua gimana hal hanya harus hingga
        ia ini itu jadi jika juga kalau kami kamu karena ke kembali
        kemudian kenapa kepada ketika kita lagi lain lalu lebih maka
        masih melainkan menjadi mereka mungkin namun oleh pada para pun
        saat saja sama sambil sampai sangat saya sebagai sebelum sebuah
        sedang sedangkan sehingga sejak sekarang selain selama seluruh
        sementara semua seorang seperti serta setelah setiap siapa
        sudah supaya tanpa tapi telah tentang terhadap tersebut tetapi
        tidak untuk walaupun yaitu yakni yang""".split()
    ),
    "hi": frozenset(
        """के का एक में की है यह और से हैं को पर इस होता कि जो कर मे गया करने
        किया लिये अपने ने बनी नहीं तो ही या एवं दिया हो इसका था द्वारा हुआ
        तक साथ करना वाले बाद लिए आप कुछ सकते किसी ये इसके सबसे इसमें थे दो
        होने वह वे करते बहुत कहा कई करें होती अपनी उनके थी यदि हुई जा ना
        इसे कहते जब होते कोई हुए व न अभी जैसे सभी करता उनकी तरह उस आदि
        रहा इसकी सकता रहे उनका इसी अपना पे उसके मैं हम तुम वो भी अगर मगर
        लेकिन क्या कौन कब कहाँ क्यों कैसे""".split()
    ),
    # languages below have no stemmer here (the `text` analyzer falls
    # back to the unstemmed chain) but full stopword defaults, so every
    # language lang_id_ngram detects gets at least tokenize + NFC +
    # lower + stopwords:
    "ar": frozenset(
        """في من على أن إلى عن مع هذا هذه ذلك التي الذي ما لا لم لن هو
        هي هم كان كانت يكون أو ثم حتى إذا كل بعض قد لقد منذ عند عندما
        بين بعد قبل حيث كيف لماذا أين متى نحن أنا أنت هناك هنا ليس غير
        بل لكن إن أي دون حول خلال ضد أمام تحت فوق أيضا كما لدى له لها
        لهم به بها منه منها إلا الى التى وهو وهي فيه فيها عليه عليها
        ولا وما ومن وكان حين لدى إذ أما أثناء""".split()
    ),
    "cs": frozenset(
        """a aby ale ani ano asi až bez bude budou by byl byla bylo být
        co což či další dnes do ho i já jak jako je jeho jejich jen
        ještě ji jiné již jsem jsi jsme jsou jste k kam kde kdo když ke
        která které který kteří má mají máme mezi mi mně mnou můj my na
        nad nám námi naše ne nebo nebyl není než nic nich ním nové nový
        o od on ona oni ono po pod podle pokud pouze pro proč proto
        protože první před přes při s se si svůj svých ta tak také
        takže tato tedy ten tento této tím tímto to tohoto tom tomto
        tomu toto tu tuto ty tyto u už v ve více však všech vy z za ze
        že""".split()
    ),
    "el": frozenset(
        """και το του της των την στο στη στης στις στα ο η οι τα ένα
        ένας μία μια με για από σε που δεν να είναι ήταν θα ως αλλά ή
        αν όταν πως ότι αυτό αυτή αυτός αυτοί μας σας τους τις κατά
        μετά πριν επί ενώ όπως εάν ούτε μη μην στον στην στους γιατί
        πολύ πιο κάθε όλα όλοι εδώ εκεί τότε τώρα ακόμα μόνο""".split()
    ),
    "he": frozenset(
        """של את על עם הוא היא הם הן אני אתה אנחנו זה זאת אלה כי לא מה
        יש אין גם רק אבל או אם כאשר כמו בין עד אחרי לפני תחת מעל כל כך
        שם פה הנה אז עוד אשר מן אל לו לה להם בו בה שלו שלה שלהם היה
        היתה היו יהיה מי למה איך מתי איפה""".split()
    ),
    "ja": frozenset(
        """の に は を た が で て と し れ さ ある いる も する から
        な こと として い や など なっ ない この ため その あっ よう
        また もの という あり まで られ なる へ か だ これ によって
        により おり より による ず なり られる において ば なかっ なく
        しかし について せ だっ できる それ ので もしくは および"""
        .split()
    ),
    "ko": frozenset(
        """이 그 저 것 수 등 들 및 에서 에게 의 를 을 은 는 가 와 과
        도 로 으로 만 에 하다 있다 되다 이다 않다 없다 같다 보다 주다
        받다 우리 저희 당신 그녀 그들 무엇 어떤 어느 아니 또 또한
        그리고 그러나 하지만 그래서 따라서 즉 만약 모든 하는 있는
        된 할 한 했다 된다""".split()
    ),
    "pl": frozenset(
        """a aby ale ani aż bardzo bez bo być był była było były będzie
        ci co czy dla do gdy gdzie go i ich im ja jak jako je jego jej
        jest jeszcze jeśli już kiedy kto która które który lub ma mają
        mi mnie mogą może my na nad nam nas nasz nie nich nim niż o od
        ona one oni ono oraz po pod ponieważ przez przy się swoje są ta
        tak także tam te tego tej ten teraz też to tu ty tych tylko tym
        u w we wszystko wy z za ze że żeby""".split()
    ),
    "uk": frozenset(
        """і в на з до не що це як а але або та у від для по при про
        між під над так той ця ці був була було були є ми ви вони він
        вона воно його її їх них нас вас мене тебе себе хто коли де
        чому якщо також вже ще тільки може бути цей яка який які щоб
        ніж через після перед б ж би""".split()
    ),
    # Thai: because running text is unspaced, these only filter when
    # the dictionary segmenter (text locale=th / segmentation cjk=True)
    # has already broken the run into words
    "th": frozenset(
        """ที่ และ ของ ใน เป็น ได้ ให้ ไม่ มี จะ ว่า มา ไป กับ แต่
        หรือ ก็ ถ้า เมื่อ จาก โดย ต้อง ถูก แล้ว ยัง อยู่ อย่าง เพราะ
        เพื่อ กว่า ตาม ด้วย นี้ นั้น ซึ่ง คือ ทั้ง ต่อ จึง เคย ควร
        อาจ กำลัง ทุก บาง หลาย อีก เอง ขึ้น ลง ออก เข้า""".split()
    ),
    "vi": frozenset(
        """và của là có được trong cho với không những các một này đã
        để người khi đến từ như về nhưng còn thì ra nếu vì tại trên
        theo sau đó nó tôi bạn chúng họ gì đây kia rằng hay hoặc nên
        bị sẽ đang rất nhiều ít mà ở lại cũng vào nào ai đều phải
        thế sự việc điều""".split()
    ),
    "zh": frozenset(
        """的 了 和 是 在 我 有 他 这 中 大 来 上 个 到 说 们 为 你 地
        出 也 时 就 那 要 下 以 会 自 着 去 之 过 家 对 可 她 里 后
        小 么 心 多 都 而 能 好 于 被 与 把 并 从 但 或 因为 所以
        什么 这个 那个 我们 他们 没有 不是 一个 这样 如果 已经 可以
        还是 但是 因此 以及 对于 通过 其中 这些 那些""".split()
    ),
}


def stopwords_for(lang: str) -> frozenset[str]:
    """Built-in stopword set for an ISO 639-1 code; empty set for
    languages without one (analysis still works, nothing filtered)."""
    return STOPWORDS.get(lang, frozenset())
