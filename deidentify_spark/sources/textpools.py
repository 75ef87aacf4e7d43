"""Authored text pools for the deterministic synthetic page generator and
the language-ID model.

All sentences here are original text written for this repo (no external
data, per the build contract). Two disjoint pools per language:

* ``GEN_SENTENCES`` — used by sources/pages.py to compose synthetic docs.
* ``LANGID_TRAINING`` — used by functions/langid.py to fit the hashed
  char-n-gram centroid model. Deliberately different sentences from the
  generator pool so the langid evaluation is not an exact-match lookup.

The English generator pool is also the vocabulary domain for the hash
n-gram perplexity LM (functions/perplexity.py trains on LANGID_TRAINING
English text plus PERPLEXITY_TRAINING below).
"""

GEN_SENTENCES = {
    "en": [
        "The committee approved the new budget after a long debate over infrastructure spending.",
        "Researchers at the university published a study on coastal erosion patterns last spring.",
        "Local farmers reported a strong harvest despite the unusually dry summer months.",
        "The city council voted to expand the public library and renovate two primary schools.",
        "Engineers completed the bridge inspection and found no structural damage to the supports.",
        "A small bakery on the corner has become famous for its sourdough bread and almond cakes.",
        "The museum opened a new exhibit featuring photographs from the early twentieth century.",
        "Volunteers planted more than three hundred trees along the riverbank this weekend.",
        "The regional rail line will add evening service between the harbor and the old town.",
        "Students presented their science projects at the annual fair in the community center.",
        "The orchestra rehearsed the symphony twice before the conductor was satisfied with the tempo.",
        "Fishing boats returned to the harbor early because a storm was forecast for the afternoon.",
        "The software update improved battery life and fixed several long-standing display issues.",
        "Historians continue to debate the causes of the treaty's sudden collapse that winter.",
        "The new hiking trail climbs gently through birch forest before reaching the summit ridge.",
        "Grocery prices rose slightly in March, driven mostly by higher transport costs.",
        "The hospital expanded its emergency department to reduce waiting times for patients.",
        "A documentary about deep-sea exploration won the festival's top prize on Saturday.",
        "The library's reading program pairs older students with children learning to read.",
        "Wind turbines along the coast now supply nearly a third of the region's electricity.",
    ],
    "fr": [
        "Le conseil municipal a approuvé la construction d'une nouvelle école primaire.",
        "Les chercheurs ont publié une étude sur l'érosion des côtes bretonnes.",
        "La boulangerie du quartier est connue pour son pain au levain et ses croissants.",
        "Les vendanges ont commencé plus tôt cette année à cause de la chaleur.",
        "Le musée présente une exposition de photographies du début du siècle dernier.",
        "Des bénévoles ont planté trois cents arbres le long de la rivière ce week-end.",
        "La ligne de train régionale ajoutera un service du soir entre le port et la vieille ville.",
        "Les élèves ont présenté leurs projets scientifiques à la foire annuelle.",
        "L'orchestre a répété la symphonie deux fois avant que le chef soit satisfait.",
        "Les bateaux de pêche sont rentrés tôt car une tempête était annoncée.",
        "Les prix des produits alimentaires ont légèrement augmenté au mois de mars.",
        "L'hôpital a agrandi son service des urgences pour réduire les temps d'attente.",
    ],
    "de": [
        "Der Gemeinderat hat den Bau einer neuen Grundschule genehmigt.",
        "Forscher der Universität veröffentlichten eine Studie über Küstenerosion.",
        "Die Bäckerei an der Ecke ist für ihr Sauerteigbrot und ihre Brezeln bekannt.",
        "Die Ernte begann dieses Jahr wegen der Hitze deutlich früher als üblich.",
        "Das Museum zeigt eine Ausstellung mit Fotografien aus dem frühen zwanzigsten Jahrhundert.",
        "Freiwillige pflanzten am Wochenende mehr als dreihundert Bäume am Flussufer.",
        "Die Regionalbahn wird abends zwischen Hafen und Altstadt häufiger fahren.",
        "Die Schüler präsentierten ihre Projekte auf der jährlichen Wissenschaftsmesse.",
        "Das Orchester probte die Sinfonie zweimal, bevor der Dirigent zufrieden war.",
        "Die Fischerboote kehrten früh zurück, weil ein Sturm angekündigt war.",
        "Die Lebensmittelpreise stiegen im März leicht an, vor allem wegen der Transportkosten.",
        "Das Krankenhaus erweiterte seine Notaufnahme, um Wartezeiten zu verkürzen.",
    ],
    "es": [
        "El ayuntamiento aprobó la construcción de una nueva escuela primaria en el barrio.",
        "Los investigadores publicaron un estudio sobre la erosión de la costa atlántica.",
        "La panadería de la esquina es famosa por su pan de masa madre y sus pasteles.",
        "La cosecha comenzó antes este año debido al calor del verano.",
        "El museo inauguró una exposición de fotografías de principios del siglo veinte.",
        "Los voluntarios plantaron más de trescientos árboles junto al río este fin de semana.",
        "La línea regional de tren añadirá servicio nocturno entre el puerto y el casco antiguo.",
        "Los estudiantes presentaron sus proyectos de ciencia en la feria anual.",
        "La orquesta ensayó la sinfonía dos veces antes de que el director quedara satisfecho.",
        "Los barcos pesqueros regresaron temprano porque se pronosticaba tormenta.",
        "Los precios de los alimentos subieron ligeramente en marzo por los costes de transporte.",
        "El hospital amplió su servicio de urgencias para reducir los tiempos de espera.",
    ],
    "it": [
        "Il consiglio comunale ha approvato la costruzione di una nuova scuola elementare.",
        "I ricercatori hanno pubblicato uno studio sull'erosione della costa adriatica.",
        "Il panificio all'angolo è famoso per il pane a lievitazione naturale e le crostate.",
        "La vendemmia è iniziata prima quest'anno a causa del gran caldo estivo.",
        "Il museo ha inaugurato una mostra di fotografie dei primi del Novecento.",
        "I volontari hanno piantato più di trecento alberi lungo il fiume questo fine settimana.",
        "La linea ferroviaria regionale aggiungerà corse serali tra il porto e il centro storico.",
        "Gli studenti hanno presentato i loro progetti alla fiera annuale della scienza.",
        "L'orchestra ha provato la sinfonia due volte prima che il direttore fosse soddisfatto.",
        "I pescherecci sono rientrati presto perché era prevista una tempesta.",
        "I prezzi degli alimentari sono saliti leggermente a marzo per i costi di trasporto.",
        "L'ospedale ha ampliato il pronto soccorso per ridurre i tempi di attesa.",
    ],
    "pt": [
        "A câmara municipal aprovou a construção de uma nova escola primária no bairro.",
        "Os investigadores publicaram um estudo sobre a erosão da costa algarvia.",
        "A padaria da esquina é famosa pelo pão de fermentação natural e pelos pastéis.",
        "A colheita começou mais cedo este ano por causa do calor do verão.",
        "O museu inaugurou uma exposição de fotografias do início do século vinte.",
        "Os voluntários plantaram mais de trezentas árvores ao longo do rio neste fim de semana.",
        "A linha ferroviária regional terá serviço noturno entre o porto e a cidade velha.",
        "Os estudantes apresentaram os seus projetos na feira anual de ciência.",
        "A orquestra ensaiou a sinfonia duas vezes até o maestro ficar satisfeito.",
        "Os barcos de pesca regressaram cedo porque estava prevista uma tempestade.",
        "Os preços dos alimentos subiram ligeiramente em março devido aos transportes.",
        "O hospital ampliou as urgências para reduzir os tempos de espera.",
    ],
    "nl": [
        "De gemeenteraad keurde de bouw van een nieuwe basisschool in de wijk goed.",
        "Onderzoekers publiceerden een studie over kusterosie langs de Noordzee.",
        "De bakkerij op de hoek staat bekend om haar zuurdesembrood en appeltaart.",
        "De oogst begon dit jaar vroeger vanwege de warme zomer.",
        "Het museum opende een tentoonstelling met foto's uit het begin van de twintigste eeuw.",
        "Vrijwilligers plantten dit weekend meer dan driehonderd bomen langs de rivier.",
        "De regionale spoorlijn krijgt een avonddienst tussen de haven en de oude stad.",
        "Leerlingen presenteerden hun projecten op de jaarlijkse wetenschapsbeurs.",
        "Het orkest repeteerde de symfonie twee keer voordat de dirigent tevreden was.",
        "De vissersboten keerden vroeg terug omdat er storm was voorspeld.",
        "De voedselprijzen stegen in maart licht door hogere transportkosten.",
        "Het ziekenhuis breidde de spoedeisende hulp uit om wachttijden te verkorten.",
    ],
    "ru": [
        "Городской совет одобрил строительство новой начальной школы в районе.",
        "Исследователи опубликовали работу об эрозии балтийского побережья.",
        "Пекарня на углу славится хлебом на закваске и медовыми пирогами.",
        "Сбор урожая начался раньше обычного из-за жаркого лета.",
        "Музей открыл выставку фотографий начала двадцатого века.",
        "Волонтёры посадили более трёхсот деревьев вдоль реки в эти выходные.",
        "Региональная железная дорога добавит вечерние рейсы между портом и старым городом.",
        "Школьники представили свои проекты на ежегодной научной ярмарке.",
        "Оркестр дважды репетировал симфонию, пока дирижёр не остался доволен.",
        "Рыбацкие лодки вернулись рано, потому что обещали шторм.",
        "Цены на продукты в марте немного выросли из-за расходов на перевозку.",
        "Больница расширила приёмное отделение, чтобы сократить время ожидания.",
    ],
    "ja": [
        "市議会は新しい小学校の建設を承認しました。",
        "研究者たちは海岸侵食に関する研究を発表しました。",
        "角のパン屋は天然酵母のパンと焼き菓子で有名です。",
        "今年は夏の暑さのため収穫が早く始まりました。",
        "博物館は二十世紀初頭の写真展を開催しています。",
        "ボランティアは週末に川沿いに三百本以上の木を植えました。",
        "地域の鉄道は港と旧市街を結ぶ夜間便を追加します。",
        "生徒たちは毎年恒例の科学フェアで研究を発表しました。",
        "指揮者が満足するまでオーケストラは交響曲を二度練習しました。",
        "嵐の予報が出たため漁船は早めに港へ戻りました。",
        "三月は輸送費の上昇により食料品の価格がわずかに上がりました。",
        "病院は待ち時間を減らすために救急外来を拡張しました。",
    ],
}

LANGID_TRAINING = {
    "en": (
        "The morning train was crowded with commuters reading newspapers and "
        "checking their watches. Outside the window, fields gave way to factories "
        "and then to rows of brick houses. She remembered the first time she had "
        "taken this route, years ago, when the station still had wooden benches. "
        "The weather report promised rain by evening, but the sky stayed stubbornly "
        "clear. He ordered coffee and toast at the counter and watched the street "
        "fill with delivery vans. The meeting had been moved twice already, and "
        "nobody expected it to start on time. A dog barked somewhere behind the "
        "market stalls while vendors arranged crates of apples and pears. The old "
        "clock above the town hall struck nine as the ferry pulled away from the "
        "dock. They spent the afternoon repairing the fence and clearing leaves "
        "from the gutters. In winter the lake freezes solid enough for skating, "
        "though few people risk it before January."
    ),
    "fr": (
        "Le train du matin était bondé de voyageurs qui lisaient le journal en "
        "regardant leur montre. Par la fenêtre, les champs laissaient place aux "
        "usines puis aux rangées de maisons en brique. Elle se souvenait de la "
        "première fois qu'elle avait pris cette ligne, il y a des années, quand la "
        "gare avait encore des bancs en bois. La météo annonçait de la pluie pour "
        "le soir, mais le ciel restait obstinément clair. Il commanda un café et "
        "des tartines au comptoir en regardant la rue se remplir de camionnettes. "
        "La réunion avait déjà été reportée deux fois et personne ne s'attendait à "
        "ce qu'elle commence à l'heure. Un chien aboyait derrière les étals du "
        "marché pendant que les vendeurs rangeaient des cageots de pommes."
    ),
    "de": (
        "Der Morgenzug war voller Pendler, die Zeitung lasen und auf ihre Uhren "
        "schauten. Vor dem Fenster wichen die Felder den Fabriken und dann den "
        "Reihen von Backsteinhäusern. Sie erinnerte sich an das erste Mal, als sie "
        "diese Strecke gefahren war, vor vielen Jahren, als der Bahnhof noch "
        "Holzbänke hatte. Der Wetterbericht versprach Regen am Abend, doch der "
        "Himmel blieb hartnäckig klar. Er bestellte Kaffee und Brötchen am Tresen "
        "und beobachtete, wie sich die Straße mit Lieferwagen füllte. Die Sitzung "
        "war schon zweimal verschoben worden, und niemand erwartete einen "
        "pünktlichen Beginn. Hinter den Marktständen bellte ein Hund, während die "
        "Händler Kisten mit Äpfeln und Birnen aufstellten."
    ),
    "es": (
        "El tren de la mañana iba lleno de viajeros que leían el periódico y "
        "miraban el reloj. Por la ventanilla, los campos daban paso a las fábricas "
        "y luego a las hileras de casas de ladrillo. Ella recordaba la primera vez "
        "que había tomado esa línea, hace años, cuando la estación todavía tenía "
        "bancos de madera. El pronóstico anunciaba lluvia para la tarde, pero el "
        "cielo seguía tercamente despejado. Pidió café y tostadas en la barra "
        "mientras miraba la calle llenarse de furgonetas de reparto. La reunión ya "
        "se había aplazado dos veces y nadie esperaba que empezara puntual. Un "
        "perro ladraba detrás de los puestos del mercado mientras los vendedores "
        "colocaban cajas de manzanas y peras."
    ),
    "it": (
        "Il treno del mattino era pieno di pendolari che leggevano il giornale e "
        "guardavano l'orologio. Dal finestrino, i campi lasciavano il posto alle "
        "fabbriche e poi alle file di case di mattoni. Lei ricordava la prima "
        "volta che aveva preso quella linea, anni fa, quando la stazione aveva "
        "ancora le panchine di legno. Le previsioni promettevano pioggia per la "
        "sera, ma il cielo restava ostinatamente sereno. Ordinò un caffè e delle "
        "fette biscottate al banco guardando la strada riempirsi di furgoni. La "
        "riunione era già stata rinviata due volte e nessuno si aspettava che "
        "cominciasse in orario. Un cane abbaiava dietro le bancarelle del mercato "
        "mentre i venditori sistemavano cassette di mele e pere."
    ),
    "pt": (
        "O comboio da manhã ia cheio de passageiros que liam o jornal e olhavam "
        "para o relógio. Pela janela, os campos davam lugar às fábricas e depois "
        "às filas de casas de tijolo. Ela lembrava-se da primeira vez que tinha "
        "apanhado aquela linha, há anos, quando a estação ainda tinha bancos de "
        "madeira. A previsão prometia chuva ao fim da tarde, mas o céu continuava "
        "teimosamente limpo. Pediu um café e torradas ao balcão enquanto via a rua "
        "encher-se de carrinhas de entrega. A reunião já tinha sido adiada duas "
        "vezes e ninguém esperava que começasse a horas. Um cão ladrava atrás das "
        "bancas do mercado enquanto os vendedores arrumavam caixas de maçãs."
    ),
    "nl": (
        "De ochtendtrein zat vol forenzen die de krant lazen en op hun horloge "
        "keken. Buiten het raam maakten de velden plaats voor fabrieken en daarna "
        "voor rijen bakstenen huizen. Ze herinnerde zich de eerste keer dat ze "
        "deze route nam, jaren geleden, toen het station nog houten banken had. "
        "Het weerbericht beloofde regen tegen de avond, maar de lucht bleef "
        "koppig helder. Hij bestelde koffie en boterhammen aan de toonbank en keek "
        "hoe de straat zich vulde met bestelwagens. De vergadering was al twee "
        "keer verzet en niemand verwachtte dat ze op tijd zou beginnen. Achter de "
        "marktkramen blafte een hond terwijl de verkopers kratten appels neerzetten."
    ),
    "ru": (
        "Утренний поезд был полон пассажиров, которые читали газеты и смотрели на "
        "часы. За окном поля сменялись заводами, а затем рядами кирпичных домов. "
        "Она вспоминала, как впервые ехала по этой линии много лет назад, когда на "
        "станции ещё стояли деревянные скамейки. Прогноз обещал дождь к вечеру, но "
        "небо упрямо оставалось ясным. Он заказал кофе с тостами у стойки и "
        "смотрел, как улица наполняется фургонами. Совещание уже дважды переносили, "
        "и никто не ждал, что оно начнётся вовремя. За рыночными прилавками лаяла "
        "собака, пока торговцы расставляли ящики с яблоками и грушами."
    ),
    "ja": (
        "朝の列車は新聞を読みながら腕時計を確かめる通勤客で混み合っていた。窓の外では畑が工場に変わり、"
        "やがて煉瓦造りの家並みが続いた。彼女は何年も前に初めてこの路線に乗った日のことを思い出した。"
        "当時の駅にはまだ木製のベンチがあった。天気予報は夕方から雨だと告げていたが、空は頑固に晴れたままだった。"
        "彼はカウンターでコーヒーとトーストを注文し、通りが配達の車で埋まっていくのを眺めた。"
        "会議はすでに二度延期されており、時間どおりに始まると思う者はいなかった。"
        "市場の屋台の裏で犬が吠え、売り子たちはりんごと梨の箱を並べていた。"
    ),
}

# Additional English text for the perplexity LM. The LM trains on
# LANGID_TRAINING['en'] + this + GEN_SENTENCES['en'] (see
# functions/perplexity.py: the background corpus deliberately covers the
# clean-English domain, as a production KenLM would) — so perplexity
# scores measure in-domain fluency, NOT held-out generalization; the
# word-salad defect class is flagged by word ORDER (unseen bigrams), not
# vocabulary.
PERPLEXITY_TRAINING = (
    "The harbor was quiet at dawn, with only a few gulls circling above the "
    "moored boats. A baker rolled up the shutters of his shop and the smell of "
    "fresh bread drifted into the street. Children walked to school in small "
    "groups, kicking stones along the pavement. The librarian sorted returned "
    "books onto a wooden cart and wheeled it between the shelves. In the "
    "afternoon a light rain fell, and umbrellas appeared along the avenue like "
    "dark flowers. The mechanic wiped his hands on a rag and closed the hood of "
    "the old truck. By evening the cafe tables were full, and conversation "
    "mixed with the clatter of cups and saucers. Far out at sea, the lighthouse "
    "began its slow, patient blinking. The night watchman made his rounds past "
    "the warehouses, checking each door in turn. A late bus rolled through the "
    "empty square, its windows bright against the dark. The professor revised "
    "her lecture notes at the kitchen table while the kettle warmed. Somewhere "
    "upstairs a radio played old songs until midnight. The carpenter measured "
    "the plank twice and marked it with a flat pencil. Morning fog lifted off "
    "the river slowly, revealing the stone arches of the bridge. Farmers "
    "loaded crates of vegetables onto a flatbed truck bound for the market. "
    "The tailor pinned the hem of a winter coat and stepped back to check the "
    "line. Rain or shine, the postman reached the last house on the hill by "
    "noon. The students argued cheerfully about the match on their way home."
)

# Register-diverse langid training supplements (round 3). The original
# LANGID_TRAINING paragraphs are one translated narrative per language;
# centroids fitted on them alone drift toward narrative prose and miss
# on other registers (measured: es legal boilerplate scored fr, a short
# de sentence scored nl — BASELINE.md "LangID on out-of-generator
# text"). These supplements cover the registers real web text actually
# has — news reporting, software/how-to, legal/commerce boilerplate,
# conversational, food/recipes — with FRESH content (the stress fixture
# stays disjoint; tests/test_langid_stress.py asserts no 40-char
# overlap). Only functions/langid.py consumes this dict; the perplexity
# LM deliberately keeps its original corpus (functions/perplexity.py)
# so its calibration goldens are unaffected.
LANGID_TRAINING_EXTRA = {
    "en": [
        "City officials confirmed on Tuesday that repairs to the harbor bridge "
        "will finish ahead of schedule, and traffic should return to both lanes "
        "before the end of the month, according to a spokesperson.",
        "To apply the update, download the package, verify the checksum, and "
        "run the installer with administrator rights. If the service fails to "
        "restart, inspect the log file for errors before trying again.",
        "By accessing this service you accept the terms and conditions set out "
        "below. The provider reserves the right to amend this agreement at any "
        "time without prior notice, and continued use constitutes acceptance.",
        "Honestly, the film felt way too long to me, but the ending nearly "
        "made up for it. Should we grab a bite somewhere before the next "
        "showing, or just head straight home?",
        "Simmer the onions in butter over low heat until golden, then add the "
        "rice and a ladle of warm stock. Stir often and season to taste with "
        "salt, pepper, and a handful of grated cheese.",
        "If the request times out, retry with exponential backoff: response = "
        "client.get(url, timeout=30); data = response.json(). Make sure the API "
        "key is set in the environment, run npm install after pulling, and check "
        "that the endpoint returns status 200 before parsing the body. The stack "
        "trace points at line 42 in utils.py, where the function returns None "
        "instead of a list.",
        "We use cookies to improve your experience on this website. You can "
        "manage your subscription and notification preferences in your account "
        "settings, and you may unsubscribe at any time. For questions about how "
        "your personal data is processed, please contact our support team.",
    ],
    "fr": [
        "La mairie a confirmé mardi que la réfection du pont du port serait "
        "achevée avant la date prévue, et la circulation reprendra sur les "
        "deux voies avant la fin du mois, selon un porte-parole.",
        "Pour appliquer la mise à jour, téléchargez le paquet, vérifiez la "
        "somme de contrôle, puis lancez l'installation avec les droits "
        "d'administrateur. Si le service ne redémarre pas, consultez le "
        "fichier journal avant de réessayer.",
        "En accédant à ce service, vous acceptez les conditions générales "
        "énoncées ci-dessous. Le prestataire se réserve le droit de modifier "
        "le présent accord à tout moment et sans préavis.",
        "Franchement, j'ai trouvé le film bien trop long, mais la fin "
        "rattrape presque tout. On se prend un truc à manger avant la "
        "prochaine séance, ou on rentre directement ?",
        "Faites revenir les oignons dans le beurre à feu doux jusqu'à ce "
        "qu'ils soient dorés, puis ajoutez le riz et une louche de bouillon "
        "chaud. Remuez souvent et assaisonnez de sel et de poivre.",
        "Nous utilisons des cookies pour améliorer votre expérience sur ce site. "
        "Vous pouvez gérer votre abonnement et vos préférences de notification "
        "dans les paramètres de votre compte, et vous désinscrire à tout moment. "
        "Pour toute question sur le traitement de vos données personnelles, "
        "contactez notre équipe d'assistance.",
    ],
    "de": [
        "Die Stadtverwaltung bestätigte am Dienstag, dass die Sanierung der "
        "Hafenbrücke früher als geplant abgeschlossen wird; der Verkehr soll "
        "laut einem Sprecher noch vor Monatsende wieder auf beiden Spuren "
        "rollen.",
        "Um das Update einzuspielen, laden Sie das Paket herunter, prüfen Sie "
        "die Prüfsumme und starten Sie die Installation mit "
        "Administratorrechten. Startet der Dienst nicht neu, sehen Sie zuerst "
        "in der Protokolldatei nach.",
        "Mit dem Zugriff auf diesen Dienst erkennen Sie die nachstehenden "
        "Geschäftsbedingungen an. Der Anbieter behält sich vor, diese "
        "Vereinbarung jederzeit ohne Ankündigung zu ändern.",
        "Ehrlich gesagt war mir der Film viel zu lang, aber das Ende hat "
        "einiges wettgemacht. Wollen wir vorher noch schnell etwas essen, "
        "oder fahren wir gleich nach Hause? Die Bäckerei an der Ecke hat "
        "heute länger auf.",
        "Dünsten Sie die Zwiebeln in Butter bei schwacher Hitze goldgelb, "
        "geben Sie dann den Reis und eine Kelle warme Brühe dazu. Oft "
        "umrühren und mit Salz und Pfeffer abschmecken.",
        "Wir verwenden Cookies, um Ihre Erfahrung auf dieser Webseite zu "
        "verbessern. Sie können Ihr Abonnement und Ihre "
        "Benachrichtigungseinstellungen in Ihrem Konto verwalten und sich "
        "jederzeit abmelden. Bei Fragen zur Verarbeitung Ihrer "
        "personenbezogenen Daten wenden Sie sich an unseren Support.",
    ],
    "es": [
        "El ayuntamiento confirmó el martes que la reparación del puente del "
        "puerto terminará antes de lo previsto, y el tráfico volverá a los "
        "dos carriles antes de fin de mes, según un portavoz.",
        "Para aplicar la actualización, descargue el paquete, compruebe la "
        "suma de verificación y ejecute el instalador con permisos de "
        "administrador. Si el servicio no se reinicia, revise el archivo de "
        "registro antes de intentarlo de nuevo.",
        "Al acceder a este servicio usted acepta los términos y condiciones "
        "expuestos a continuación. El proveedor se reserva el derecho de "
        "modificar el presente acuerdo en cualquier momento y sin previo "
        "aviso.",
        "La verdad, la película se me hizo larguísima, pero el final casi lo "
        "compensa. ¿Comemos algo antes de la próxima función o nos vamos "
        "directamente a casa?",
        "Sofría la cebolla en mantequilla a fuego lento hasta que esté "
        "dorada, añada el arroz y un cucharón de caldo caliente. Remueva a "
        "menudo y sazone con sal y pimienta al gusto.",
        "Utilizamos cookies para mejorar su experiencia en este sitio web. Puede "
        "gestionar su suscripción y sus preferencias de notificación en la "
        "configuración de su cuenta, y darse de baja en cualquier momento. Si "
        "tiene preguntas sobre el tratamiento de sus datos personales, póngase "
        "en contacto con nuestro equipo de soporte.",
    ],
    "it": [
        "Il comune ha confermato martedì che il restauro del ponte del porto "
        "sarà completato prima del previsto, e il traffico tornerà su "
        "entrambe le corsie entro la fine del mese, secondo un portavoce.",
        "Per applicare l'aggiornamento, scaricate il pacchetto, verificate "
        "la somma di controllo ed eseguite l'installazione con i permessi di "
        "amministratore. Se il servizio non riparte, controllate prima il "
        "file di registro.",
        "Accedendo a questo servizio l'utente accetta i termini e le "
        "condizioni riportati di seguito. Il fornitore si riserva il diritto "
        "di modificare il presente accordo in qualsiasi momento senza "
        "preavviso.",
        "Sinceramente il film mi è sembrato troppo lungo, però il finale "
        "ripaga quasi tutto. Mangiamo qualcosa prima del prossimo "
        "spettacolo o torniamo subito a casa?",
        "Fate appassire la cipolla nel burro a fuoco dolce finché non è "
        "dorata, poi unite il riso e un mestolo di brodo caldo. Mescolate "
        "spesso e regolate di sale e pepe.",
        "Utilizziamo i cookie per migliorare la vostra esperienza su questo "
        "sito. Potete gestire l'abbonamento e le preferenze di notifica nelle "
        "impostazioni del vostro account e annullare l'iscrizione in qualsiasi "
        "momento. Per domande sul trattamento dei dati personali, contattate il "
        "nostro servizio di assistenza.",
    ],
    "pt": [
        "A câmara municipal confirmou na terça-feira que a reparação da "
        "ponte do porto ficará pronta antes do previsto, e o trânsito "
        "voltará às duas faixas antes do fim do mês, segundo um porta-voz.",
        "Para aplicar a atualização, descarregue o pacote, confirme a soma "
        "de verificação e execute o instalador com permissões de "
        "administrador. Se o serviço não reiniciar, verifique o ficheiro de "
        "registo antes de tentar novamente.",
        "Ao aceder a este serviço, o utilizador aceita os termos e condições "
        "descritos abaixo. O fornecedor reserva-se o direito de alterar o "
        "presente acordo a qualquer momento e sem aviso prévio.",
        "Sinceramente, achei o filme comprido demais, mas o final quase "
        "compensa. Vamos comer qualquer coisa antes da próxima sessão ou "
        "seguimos logo para casa?",
        "Refogue a cebola na manteiga em lume brando até dourar, junte o "
        "arroz e uma concha de caldo quente. Mexa com frequência e tempere "
        "com sal e pimenta a gosto.",
        "Utilizamos cookies para melhorar a sua experiência neste site. Pode "
        "gerir a sua subscrição e as preferências de notificação nas definições "
        "da sua conta, e cancelar a subscrição a qualquer momento. Em caso de "
        "dúvidas sobre o tratamento dos seus dados pessoais, contacte a nossa "
        "equipa de apoio.",
    ],
    "nl": [
        "Het stadsbestuur bevestigde dinsdag dat het herstel van de "
        "havenbrug eerder klaar is dan gepland; het verkeer rijdt volgens "
        "een woordvoerder voor het einde van de maand weer over beide "
        "rijstroken.",
        "Om de update toe te passen downloadt u het pakket, controleert u de "
        "controlesom en voert u het installatieprogramma uit met "
        "beheerdersrechten. Start de dienst niet opnieuw op, kijk dan eerst "
        "in het logbestand.",
        "Door gebruik te maken van deze dienst aanvaardt u de onderstaande "
        "algemene voorwaarden. De aanbieder behoudt zich het recht voor deze "
        "overeenkomst op elk moment zonder kennisgeving te wijzigen.",
        "Eerlijk gezegd vond ik de film veel te lang, maar het einde maakte "
        "veel goed. Zullen we nog even iets eten voor de volgende "
        "voorstelling, of gaan we meteen naar huis?",
        "Fruit de uien in boter op laag vuur goudgeel, voeg dan de rijst en "
        "een soeplepel warme bouillon toe. Roer regelmatig en breng op smaak "
        "met zout en peper.",
        "Wij gebruiken cookies om uw ervaring op deze website te verbeteren. U "
        "kunt uw abonnement en meldingsvoorkeuren beheren in uw "
        "accountinstellingen en u op elk moment uitschrijven. Voor vragen over "
        "de verwerking van uw persoonsgegevens kunt u contact opnemen met onze "
        "klantenservice.",
    ],
    "ru": [
        "Городская администрация подтвердила во вторник, что ремонт моста в "
        "порту завершится раньше срока, и движение по обеим полосам "
        "возобновится до конца месяца, сообщил представитель мэрии.",
        "Чтобы установить обновление, скачайте пакет, проверьте контрольную "
        "сумму и запустите установщик с правами администратора. Если служба "
        "не перезапускается, сначала посмотрите файл журнала.",
        "Получая доступ к этому сервису, вы принимаете изложенные ниже "
        "условия использования. Поставщик оставляет за собой право изменять "
        "настоящее соглашение в любое время без предварительного "
        "уведомления.",
        "Честно говоря, фильм показался мне слишком длинным, но концовка "
        "почти всё исправила. Перекусим что-нибудь перед следующим сеансом "
        "или сразу поедем домой?",
        "Обжарьте лук в сливочном масле на слабом огне до золотистого "
        "цвета, затем добавьте рис и половник тёплого бульона. Часто "
        "помешивайте и приправьте солью и перцем по вкусу.",
        "Мы используем файлы cookie, чтобы улучшить вашу работу с этим сайтом. "
        "Вы можете управлять подпиской и настройками уведомлений в личном "
        "кабинете и отписаться в любой момент. По вопросам обработки "
        "персональных данных обращайтесь в службу поддержки.",
    ],
    "ja": [
        "市当局は火曜日、港の橋の補修工事が予定より早く完了すると発表した。広報担当者によると、今月末までに両車線の通行が再開される見込みだという。",
        "更新を適用するには、パッケージをダウンロードしてチェックサムを確認し、管理者権限でインストーラーを実行してください。サービスが再起動しない場合は、まずログファイルを確認してください。",
        "本サービスを利用することにより、利用者は以下に定める利用規約に同意したものとみなされます。提供者は本契約を予告なくいつでも変更する権利を有します。",
        "正直なところ、映画は長すぎると思ったけれど、結末でほとんど取り返した気がする。次の上映の前に何か食べに行く、それともまっすぐ帰る？",
        "弱火でバターを溶かし、玉ねぎを黄金色になるまで炒めてから、米と温かいスープをお玉一杯加えます。頻繁にかき混ぜ、塩と胡椒で味を調えてください。",
        "当サイトでは、快適にご利用いただくためにクッキーを使用しています。アカウント設定から購読と通知の設定を管理でき、"
        "いつでも配信を停止できます。個人データの取り扱いに関するご質問は、サポートチームまでお問い合わせください。",
    ],
}
