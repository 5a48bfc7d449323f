"""Per-language stop-word sets (the snowball stop lists that back Lucene's
{Lang}Analyzer default stop sets, which the reference exposes through
StopTokenFilterFactory's named lists — index/analysis/StopTokenFilterFactory
and modules/analysis-common language analyzer registrations)."""

from __future__ import annotations

STOP_SETS: dict[str, frozenset[str]] = {
    "french": frozenset("""
au aux avec ce ces dans de des du elle en et eux il ils je la le les leur
lui ma mais me même mes moi mon ne nos notre nous on ou par pas pour qu que
qui sa se ses son sur ta te tes toi ton tu un une vos votre vous c d j l à
m n s t y été étée étées étés étant suis es est sommes êtes sont serai seras
sera serons serez seront serais serait serions seriez seraient étais était
étions étiez étaient fus fut fûmes fûtes furent sois soit soyons soyez
soient fusse fusses fût fussions fussiez fussent ayant eu eue eues eus ai as
avons avez ont aurai auras aura aurons aurez auront aurais aurait aurions
auriez auraient avais avait avions aviez avaient eut eûmes eûtes eurent aie
aies ait ayons ayez aient eusse eusses eût eussions eussiez eussent
""".split()),
    "german": frozenset("""
aber alle allem allen aller alles als also am an ander andere anderem
anderen anderer anderes anderm andern anderr anders auch auf aus bei bin bis
bist da damit dann der den des dem die das daß derselbe derselben denselben
desselben demselben dieselbe dieselben dasselbe dazu dein deine deinem
deinen deiner deines denn derer dessen dich dir du dies diese diesem diesen
dieser dieses doch dort durch ein eine einem einen einer eines einig einige
einigem einigen einiger einiges einmal er ihn ihm es etwas euer eure eurem
euren eurer eures für gegen gewesen hab habe haben hat hatte hatten hier hin
hinter ich mich mir ihr ihre ihrem ihren ihrer ihres euch im in indem ins
ist jede jedem jeden jeder jedes jene jenem jenen jener jenes jetzt kann
kein keine keinem keinen keiner keines können könnte machen man manche
manchem manchen mancher manches mein meine meinem meinen meiner meines mit
muss musste nach nicht nichts noch nun nur ob oder ohne sehr sein seine
seinem seinen seiner seines selbst sich sie ihnen sind so solche solchem
solchen solcher solches soll sollte sondern sonst über um und uns unse
unsem unsen unser unses unter viel vom von vor während war waren warst was
weg weil weiter welche welchem welchen welcher welches wenn werde werden
wie wieder will wir wird wirst wo wollen wollte würde würden zu zum zur
zwar zwischen
""".split()),
    "spanish": frozenset("""
de la que el en y a los del se las por un para con no una su al lo como
más pero sus le ya o este sí porque esta entre cuando muy sin sobre también
me hasta hay donde quien desde todo nos durante todos uno les ni contra
otros ese eso ante ellos e esto mí antes algunos qué unos yo otro otras
otra él tanto esa estos mucho quienes nada muchos cual poco ella estar
estas algunas algo nosotros mi mis tú te ti tu tus ellas nosotras vosotros
vosotras os mío mía míos mías tuyo tuya tuyos tuyas suyo suya suyos suyas
nuestro nuestra nuestros nuestras vuestro vuestra vuestros vuestras esos
esas estoy estás está estamos estáis están esté estés estemos estéis estén
estaré estarás estará estaremos estaréis estarán estaría estarías
estaríamos estaríais estarían estaba estabas estábamos estabais estaban
estuve estuviste estuvo estuvimos estuvisteis estuvieron he has ha hemos
habéis han haya hayas hayamos hayáis hayan habré habrás habrá habremos
habréis habrán había habías habíamos habíais habían soy eres es somos sois
son sea seas seamos seáis sean seré serás será seremos seréis serán era
eras éramos erais eran fui fuiste fue fuimos fuisteis fueron tengo tienes
tiene tenemos tenéis tienen tenga tengas tengamos tengáis tengan tendré
tendrás tendrá tendremos tendréis tendrán tenía tenías teníamos teníais
tenían tuve tuviste tuvo tuvimos tuvisteis tuvieron
""".split()),
    "italian": frozenset("""
ad al allo ai agli all agl alla alle con col coi da dal dallo dai dagli
dall dagl dalla dalle di del dello dei degli dell degl della delle in nel
nello nei negli nell negl nella nelle su sul sullo sui sugli sull sugl
sulla sulle per tra contro io tu lui lei noi voi loro mio mia miei mie tuo
tua tuoi tue suo sua suoi sue nostro nostra nostri nostre vostro vostra
vostri vostre mi ti ci vi lo la li le gli ne il un uno una ma ed se perché
anche come dov dove che chi cui non più quale quanto quanti quanta quante
quello quelli quella quelle questo questi questa queste si tutto tutti a c
e i l o ho hai ha abbiamo avete hanno abbia abbiate abbiano avrò avrai
avrà avremo avrete avranno avrei avresti avrebbe avremmo avreste avrebbero
avevo avevi aveva avevamo avevate avevano ebbi avesti ebbe avemmo aveste
ebbero avessi avesse avessimo avessero avendo avuto avuta avuti avute sono
sei è siamo siete sia siate siano sarò sarai sarà saremo sarete saranno
sarei saresti sarebbe saremmo sareste sarebbero ero eri era eravamo
eravate erano fui fosti fu fummo foste furono fossi fosse fossimo fossero
essendo faccio fai facciamo fanno faccia facciate facciano farò farai farà
faremo farete faranno farei faresti farebbe faremmo fareste farebbero
facevo facevi faceva facevamo facevate facevano feci facesti fece facemmo
faceste fecero facessi facesse facessimo facessero facendo sto stai sta
stiamo stanno stia stiate stiano starò starai starà staremo starete
staranno starei staresti starebbe staremmo stareste starebbero stavo stavi
stava stavamo stavate stavano stetti stesti stette stemmo steste stettero
stessi stesse stessimo stessero stando
""".split()),
    "portuguese": frozenset("""
de a o que e do da em um para é com não uma os no se na por mais as dos
como mas foi ao ele das tem à seu sua ou ser quando muito há nos já está
eu também só pelo pela até isso ela entre era depois sem mesmo aos ter
seus quem nas me esse eles estão você tinha foram essa num nem suas meu às
minha têm numa pelos elas havia seja qual será nós tenho lhe deles essas
esses pelas este fosse dele tu te vocês vos lhes meus minhas teu tua teus
tuas nosso nossa nossos nossas dela delas esta estes estas aquele aquela
aqueles aquelas isto aquilo estou estamos esteja estejamos estejam estive
esteve estivemos estiveram estava estávamos estavam estivera estivéramos
haja hajamos hajam houve houvemos houveram houvera houvéramos sou somos
são era éramos eram fui foi fomos seja sejamos sejam fora fôramos fosse
fôssemos fossem for formos serei será seremos serão seria seríamos seriam
tenha tenhamos tenham tinha tínhamos tinham tive teve tivemos tiveram
tivera tivéramos terei terá teremos terão teria teríamos teriam
""".split()),
    "dutch": frozenset("""
de en van ik te dat die in een hij het niet zijn is was op aan met als
voor had er maar om hem dan zou of wat mijn men dit zo door over ze zich
bij ook tot je mij uit der daar haar naar heb hoe heeft hebben deze u want
nog zal me zij nu ge geen omdat iets worden toch al waren veel meer doen
toen moet ben zonder kan hun dus alles onder ja eens hier wie werd altijd
doch wordt wezen kunnen ons zelf tegen na reeds wil kon niets uw iemand
geweest andere
""".split()),
    "russian": frozenset("""
и в во не что он на я с со как а то все она так его но да ты к у же вы за
бы по только ее мне было вот от меня еще нет о из ему теперь когда даже ну
вдруг ли если уже или ни быть был него до вас нибудь опять уж вам ведь там
потом себя ничего ей может они тут где есть надо ней для мы тебя их чем
была сам чтоб без будто чего раз тоже себе под будет ж тогда кто этот того
потому этого какой совсем ним здесь этом один почти мой тем чтобы нее
сейчас были куда зачем всех никогда можно при наконец два об другой хоть
после над больше тот через эти нас про всего них какая много разве три эту
моя впрочем хорошо свою этой перед иногда лучше чуть том нельзя такой им
более всегда конечно всю между это
""".split()),
    "english": frozenset("""
a an and are as at be but by for if in into is it no not of on or such
that the their then there these they this to was will with
""".split()),
}

STOP_SETS.update({
    "swedish": frozenset("""
och det att i en jag hon som han på den med var sig för så till är men ett
om hade de av icke mig du henne då sin nu har inte hans honom skulle hennes
där min man ej vid kunde något från ut när efter upp vi dem vara vad över
än dig kan sina här ha mot alla under någon eller allt mycket sedan ju
denna själv detta åt utan varit hur ingen mitt ni bli blev oss din dessa
några deras blir mina samma vilken er sådan vår blivit dess inom mellan
sådant varför varje vilka ditt vem vilket sitta sådana vart dina vars vårt
våra ert era vilkas
""".split()),
    "norwegian": frozenset("""
og i jeg det at en et den til er som på de med han av ikke ikkje der så
var meg seg men ett har om vi min mitt ha hadde hun nå over da ved fra du
ut sin dem oss opp man kan hans hvor eller hva skal selv sjøl her alle
vil bli ble blei bli't kunne inn når være kom noen noe ville dere som deres
kun ja etter ned skulle denne for deg si sine sitt mot å meget hvorfor
dette disse uten hvordan ingen din ditt blir samme hvilken hvilke sånn
inni mellom vår hver hvem vors hvis både bare enn fordi før mange også
slik vært bak
""".split()),
    "danish": frozenset("""
og i jeg det at en den til er som på de med han af for ikke der var mig
sig men et har om vi min havde ham hun nu over da fra du ud sin dem os op
man hans hvor eller hvad skal selv her alle vil blev kunne ind når være
dog noget ville jo deres efter ned skulle denne end dette mit også under
have dig anden hende mine alt meget sit sine vor mod disse hvis din nogle
hos blive mange ad bliver hendes været thi jer sådan
""".split()),
    "arabic": frozenset("""
من في على و فى يا ما لا ان إن أن الى إلى هذا هذه ذلك تلك التي الذي عن مع
هو هي انه أنه كان كانت قد لقد لم لن له لها به بها او أو ثم اذا إذا كل بعد
قبل حتى عند عندما بين وهو وهي فيه منها منه اليوم كما لكن و إن يكون تكون
وقال وقالت ايضا أيضا ولم ومن وما فيها اي أي كيف هناك
""".split()),
    # Persian frequent-word set (the PersianAnalyzer stop list shape; this
    # is the high-frequency subset — extend via register_analyzer for
    # domain lists). Written in normalized form (farsi yeh/keheh), matching
    # the stream AFTER analyze_persian's fold.
    "persian": frozenset("""
و در به از که این را با است برای آن یک خود تا کرد بر هم نیز گفت می شود
وی شد دارد ما اما یا بود باید هر او دو مورد تواند کند نیست
شده بودن بسیار چه اگر همه نه دیگر آنها یکی بی آنان
""".split()),
})

# Round-3c language additions. Each is the high-frequency core of the
# published per-language stop list (snowball / Lucene default sets);
# extend via register_analyzer for full domain lists.
STOP_SETS.update({
    "romanian": frozenset("""
şi și în a ca pe este de la cu o un nu se sa să care mai din sau dacă
daca pentru dar au fost fi sunt era erau lui ei el ea noi voi dupa după
prin sub ar avea acest această aceasta aceste acestei acestui ale al
unei unui unor le li il îl isi își iti îți imi îmi intr într fara fără
când cand cum unde cine ce cel cea cei cele tot toate toți toti foarte
asa așa deci ori iar însă insa între intre peste
""".split()),
    "finnish": frozenset("""
ja on ei se että etta hän han oli en olla mutta niin kuin myös myos sitä
sita tämä tama tässä tassa joka jonka mitä mita kun nyt siitä siita sen
hänen hanen ovat ole jos vain me he ne nämä nama näitä naita mikä mika
minä mina sinä sina te tai sekä seka vielä viela jo kanssa mukaan ilman
jälkeen jalkeen ennen koska siis myöhemmin kaikki kaksi yksi
""".split()),
    "hungarian": frozenset("""
a az és es hogy nem is egy ez de van volt már mar csak meg ha mint el
vagy ki mi azt ő o ők ok én en te mert még meg ezt arra ebben ezek
azok aki ami amely amelyek lesz lehet kell minden nagyon volt vannak
voltak úgy ugy így igy most itt ott után utan előtt elott alatt felett
között kozott által altal vele nála nala neki őket oket
""".split()),
    "turkish": frozenset("""
ve bir bu da de için icin ile olarak o ki en çok cok daha ama gibi var
ne kadar sonra olan her mi mı mu mü ya veya ise değil degil ancak diye
üzere uzere kendi biz siz onlar ben sen şu su ilk hem yani çünkü cunku
arasında arasinda önce once şimdi simdi böyle boyle nasıl nasil bütün
butun bazı bazi hiç hic oldu olur olduğu oldugu
""".split()),
    # written in folded form (tonos stripped, final sigma -> σ): the stop
    # filter runs AFTER greek_fold in the chain
    "greek": frozenset("""
ο η το οι τα του τησ των τον την τουσ τισ τεσ και κι κ ειμαι εισαι ειναι ειμαστε
ειστε στο στον στη στην στα στουσ στισ μα αλλα απο για προσ με σε ωσ παρα αντι κατα
μετα θα να δε δεν μη μην επι ενω εαν αν τοτε που πωσ ποιοσ ποια ποιο
ποιοι ποιεσ ποιων ποιουσ αυτοσ αυτη αυτο αυτοι αυτων αυτουσ αυτεσ ολα
ολοι ολεσ ολα ετσι ομωσ ισωσ οσο οτι
""".split()),
    "hindi": frozenset("""
के का एक में की है यह और से हैं को पर इस होता कि जो कर मे गया करने किया
लिये अपने ने बनी नहीं तो ही या हो था द्वारा हुआ तक साथ करना वाले बाद
लिए सकते इसमें दो होने वह वे करते बहुत कहा वर्ग कई करें होती अपनी उनके
थी थे यदि हुई जा ना इसे कहते जब होते कोई हुए व जैसे सभी करता उनकी तरह उस
आदि इसका दिया जिस
""".split()),
    "czech": frozenset("""
a v na je se že ze s z do o i to by si ale jako za po od pro tak co
když kdyz už uz jsou byl být byt bylo byla jsem jsi jsme jste má ma
mít mit ji jí všech vsech nebo ho jeho jejich její jeji než nez který
ktery která ktera které ktere kteří kteri při pri před pred mezi pod
nad tím tim tom ten ta ty my vy on ona ono oni kde kdy jak ani nic
něco neco
""".split()),
    "bulgarian": frozenset("""
и в на за е се от да по не с а това той тя то те са или ако но като
ли при който която което които със из до ще би беше бяха има имат
му ѝ ги им ни ви ме те си ние вие аз ти един една едно кой коя кое
кои какво как къде кога защо защото че още само вече без над под
между след преди всички всеки тук там
""".split()),
    "latvian": frozenset("""
un ir es tas tā ta viņš vins viņa vina uz no ar par pie pēc pec kā ka
kad ja bet vai arī ari lai šis sis šī si tie tās tas mēs mes jūs jus
viņi vini būt but bija ne nav jau tikai vēl vel visi visas kas ko kam
kur kāpēc kapec tad tur šeit seit starp pirms caur bez pret savu sava
man tev mums jums
""".split()),
    "indonesian": frozenset("""
yang dan di ke dari untuk pada adalah ini itu dengan tidak akan ada
juga saya kamu dia mereka kami kita atau tetapi tapi karena jika kalau
sudah telah belum bisa dapat harus oleh dalam luar atas bawah antara
sebagai seperti begitu hanya saja lebih sangat paling ketika saat
sebelum sesudah setelah bagaimana mengapa dimana siapa apa berapa
bukan agar supaya namun
""".split()),
    # written in normalized form (farsi yeh/keheh), matching the stream
    # after sorani_normalize
    "sorani": frozenset("""
و لە بە کە ئەو ئەم بۆ دە لەگەڵ هەر وە یان نە ئەگەر بەڵام چونکە دوای
پێش لەسەر ژێر نێوان هەموو هیچ چەند یەک دوو ئێمە ئێوە ئەوان من تۆ
ئەویش هەیە نییە بوو دەبێت کرد دەکات بکات ناو
""".split()),
    # Brazilian Portuguese: the Portuguese set plus Brazilian-usage forms
    "brazilian": STOP_SETS["portuguese"] | frozenset("""
você vocês pra pro num numa dum duma
""".split()),
})

# Round-3d language additions — the final ten of the reference's 35
# registered language analyzers (CommonAnalysisPlugin.java:188-223). Each
# is the high-frequency core of the published per-language stop list.
STOP_SETS.update({
    "armenian": frozenset("""
եւ և է այդ այս նա որ են էր ես դու մենք դուք նրանք իր իմ քո մեր ձեր
նրա որը որոնք ու կամ բայց եթե երբ ինչ ով այն ըստ մեջ վրա հետ համար էին էի էինք էիր
մասին միայն նաեւ նաև ամեն այլ չի չեն չէ լինել կա կան
""".split()),
    "basque": frozenset("""
eta da dira zen ziren du dute zuen zuten bat batzuk ez bai edo baina
hau hori hura hauek horiek haiek ni hi gu zu zuek bere nire zure gure
al ere oso baino arte gabe arabera bezala zer nor non noiz nola zein
izan egin egiten dago daude asko gutxi beste guzti
""".split()),
    "bengali": frozenset("""
এই যে ও এবং করে না হয় থেকে এর তার সে আমি তুমি আপনি আমরা তারা কি কে
একটি একটা হবে ছিল করা হয়েছে হয়ে জন্য সঙ্গে সাথে কিন্তু আর বা যদি তবে
তা এটা সেটা কোন কোনো সব আছে নেই দিয়ে নিয়ে পরে আগে মধ্যে উপর নিচে
যা যার কেন কীভাবে কোথায় কখন
""".split()),
    "catalan": frozenset("""
de la el els les i a en un una que es per amb no al del dels ell ella
jo tu nosaltres vosaltres ells elles aquest aquesta aquests aquestes
això allò com més molt poc tot tots seva seu meva meu teva teu si o
però perquè quan on qui què hi ha han és són era eren fou ser estar
està estan sense sobre entre fins des
""".split()),
    "estonian": frozenset("""
ja on ei see ta et oli ka kui oma aga ma sa me te nad mis kes seda
selle tema mina sina meie teie nende ning või siis nii veel juba ainult
üle alla peale enne pärast ilma koos vastu läbi kus millal kuidas miks
olema olen oled oleme olete olid olnud tema kõik mõni teine üks kaks
""".split()),
    "galician": frozenset("""
de a o e que do da en un é se non os as para con unha por máis pero
ao dos das como lle me te nos vos nas coas cos coa nun nunha polo pola súa seu miña meu túa teu este esta
estes estas ese esa eses esas aquel aquela el ela eles elas nós vós eu
ti foi era eran son ser estar está están sen sobre entre ata desde
cando onde quen cal
""".split()),
    "irish": frozenset("""
agus an na is tá bhí ar le i in do de go nach ní sé sí mé tú muid sibh
siad a ag as ach bha beidh bheith chun dá faoi gan idir mar nó ó roimh
seo sin siúd trí um cad cé conas cathain cén aon gach eile é í iad sna leis don den faoin tríd dár insan
""".split()),
    "lithuanian": frozenset("""
ir yra buvo kad į iš su ne tai jis ji aš tu mes jūs jie jos savo mano
tavo mūsų jūsų jo jos bet ar o kai jei kaip kur kas kodėl kada šis ši
šie šios tas ta tie tos visi visos labai dar tik taip pat prie po per
apie nuo iki be už prieš tarp bus būti gali galima turi
""".split()),
    # The reference's "chinese" analyzer is Lucene's StandardAnalyzer
    # with the ENGLISH stop set (ChineseAnalyzerProvider.java — the old
    # ChineseAnalyzer was retired upstream); reuse the english list.
    "chinese": STOP_SETS["english"],
    # stempel plugin Polish stop set (representative subset of the
    # plugin's polish_stop.txt)
    "polish": frozenset("""
i w na z do się nie jest to że o a jak po za od ale czy dla przez
był była było być są tym tego też już tylko może przy ich jego jej
""".split()),
    # ukrainian plugin stop set (representative subset)
    "ukrainian": frozenset("""
і в у на з до та що як але не є це був була було бути по за від
цей ця це ті його її їх же ж бо коли або
""".split()),
    # kuromoji-substitute hiragana particle stop set
    "japanese": frozenset("""
の に は を た が で て と し れ さ ある いる も する から な こと
として い や など なっ ない この ため その あっ よう また もの
""".split()),
    # nori-substitute Korean stop set (standalone function words)
    "korean": frozenset("""
그 이 저 것 수 때 및 또 또는 그리고 하지만 그러나 즉 딱 등 들
""".split()),
    "thai": frozenset("""
ที่ การ เป็น ใน ของ และ มี ได้ ว่า ให้ จะ ไม่ ก็ แล้ว ไป มา กับ นี้
นั้น อยู่ อย่าง คือ จาก โดย หรือ เมื่อ ถ้า แต่ ต้อง ตาม ทั้ง กว่า จึง
ด้วย เขา เรา ซึ่ง ๆ เพราะ ครั้ง อีก ถึง ขึ้น ลง แห่ง ทำ ความ
""".split()),
})
