package graft.functions

import java.util.Locale

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `langid(text)` — character-trigram language identification against a
  * FIXED, in-repo model (the CCNet/C4 stage that runs immediately after
  * HTML text extraction: every per-language pipeline stage keys on a
  * `lang` column that raw crawl data does not carry).
  *
  * Model: per-language trigram log-probabilities with add-one (Laplace)
  * smoothing over the GLOBAL trigram vocabulary of the seed corpus,
  * trained at class-init from [[LangIdModel.seeds]] — a deterministic,
  * versioned artifact of this repo, so the same text classifies the same
  * way on every cluster and every run (and the DuckDB oracle can re-derive
  * the identical model from the identical seed literals in SQL).
  *
  * Scoring: lowercase, slide a 3-char window, sum `logp(tri | lang)` per
  * language (out-of-vocabulary trigrams cost the language's smoothed OOV
  * mass `ln(1/(total+V))`), argmax with deterministic ties (language name
  * ascending). Returns `struct<lang, avg_lp, margin, oov_gap, n_tri>`:
  *
  *  - `lang`     — argmax language code, or "und" when the text has no
  *                 trigram (length < 3);
  *  - `avg_lp`   — best per-trigram average log-probability;
  *  - `margin`   — best minus second-best average: classification
  *                 confidence (mixed-language text compresses it);
  *  - `oov_gap`  — `avg_lp` minus the argmax language's own smoothed OOV
  *                 rate: the SELF-CALIBRATING "is this even a language we
  *                 know" signal. Text sharing no trigram with any seed
  *                 (an unseen script) scores every language at exactly
  *                 its OOV rate, so the gap is exactly 0; genuine text in
  *                 a model language sits well above. Unlike an absolute
  *                 avg floor, the gap needs no re-tuning when languages
  *                 with different trigram coverage join the model;
  *  - `n_tri`    — trigram count (evidence size; short strings are noisy).
  *
  * Model scope: Latin + Cyrillic scripts. Character TRIGRAMS under-cover
  * unsegmented CJK at seed-corpus scale (a held-out Chinese sentence can
  * share zero trigrams with hundreds of seed characters — measured, not
  * speculation), so CJK coverage needs lower-order char features
  * (unigram/bigram mixes, the fastText recipe) — a model change, not an
  * operator change; unseen scripts meanwhile fall back to "und" via the
  * gap rule.
  *
  * Threshold policy (what counts as "unknown") deliberately lives in the
  * OPERATOR ([[graft.operators.LangId.classify]]), not here — the raw
  * scores are the reusable primitive.
  *
  * Execution: one codegen'd map-side kernel call per row — zero shuffle at
  * any corpus size; the model is a static JVM-singleton (a few hundred
  * trigrams per language), never a broadcast or a join.
  */
object LangIdModel {

  /** The fixed training corpus: (language, seed text) — lowercase,
    * apostrophe-free, BMP-only by construction (so code-point and UTF-16
    * indexing agree, and the texts embed verbatim into oracle SQL
    * literals). Editing a seed changes the model version: every
    * classification downstream is derived from these strings alone.
    */
  val seeds: Seq[(String, String)] = Seq(
    "de" -> ("der schnelle braune fuchs springt über den faulen hund während die kinder vom fenster aus zuschauen. " +
      "dies ist eine kurze geschichte über das wetter und die menschen die in der alten stadt am fluss wohnen. " +
      "wir sollten immer daran denken dass wissen und freiheit in jedem freien land zusammengehören. " +
      "die schüler lesen ihre bücher in der bibliothek und sprechen jeden nachmittag über geschichte und wissenschaft. " +
      "es gab eine zeit in der die welt viel größer erschien und jede reise viele wochen dauerte. " +
      "man sagt dass der frühe vogel den wurm fängt aber die zweite maus bekommt den käse. " +
      "gute freunde helfen einander durch schwere zeiten und teilen die guten zeiten miteinander. " +
      "die regierung kündigte einen neuen plan für schulen und krankenhäuser im ganzen land an. " +
      "am morgen trinkt sie eine tasse kaffee und isst brot mit butter und honig. " +
      "der zug verlässt den bahnhof um sieben und erreicht die stadt zwei stunden später. " +
      "mein bruder spielt klavier und meine schwester singt am abend alte lieder. " +
      "der markt verkauft frisches obst und gemüse von den höfen nahe den bergen. " +
      "es regnete die ganze nacht aber am späten morgen kam die sonne wieder heraus. " +
      "der brief kam am montag an und die antwort wurde in derselben woche geschrieben. " +
      "jedes jahr reist die familie ans meer und verbringt den sommer am wasser."),
    "en" -> ("the quick brown fox jumps over the lazy dog while the children watch from the window. " +
      "this is a short story about the weather and the people who live in the old town by the river. " +
      "we should always remember that knowledge and freedom belong together in every free country. " +
      "the students read their books in the library and talk about history and science every afternoon. " +
      "there was a time when the world seemed much larger and every journey took many weeks. " +
      "people say that the early bird catches the worm but the second mouse gets the cheese. " +
      "good friends help each other through the hard times and share the good times together. " +
      "the government announced a new plan for schools and hospitals across the whole country. " +
      "in the morning she drinks a cup of coffee and eats bread with butter and honey. " +
      "the train leaves the station at seven and arrives in the city two hours later. " +
      "my brother plays the piano and my sister sings old songs in the evening. " +
      "the market sells fresh fruit and vegetables from the farms near the mountains. " +
      "it rained all night but the sun came out again in the late morning. " +
      "the letter arrived on monday and the answer was written the same week. " +
      "every year the family travels to the sea and spends the summer near the water."),
    "es" -> ("el rápido zorro marrón salta sobre el perro perezoso mientras los niños miran desde la ventana. " +
      "esta es una historia corta sobre el tiempo y la gente que vive en la ciudad vieja junto al río. " +
      "siempre debemos recordar que el conocimiento y la libertad van juntos en cada país libre. " +
      "los estudiantes leen sus libros en la biblioteca y hablan cada tarde de historia y de ciencia. " +
      "hubo un tiempo en que el mundo parecía mucho más grande y cada viaje duraba muchas semanas. " +
      "dicen que al que madruga dios lo ayuda pero la paciencia también es una gran virtud. " +
      "los buenos amigos se ayudan en los momentos difíciles y comparten juntos los buenos momentos. " +
      "el gobierno anunció un nuevo plan para las escuelas y los hospitales de todo el país. " +
      "por la mañana ella bebe una taza de café y come pan con mantequilla y miel. " +
      "el tren sale de la estación a las siete y llega a la ciudad dos horas después. " +
      "mi hermano toca el piano y mi hermana canta viejas canciones por la noche. " +
      "el mercado vende fruta fresca y verduras de las granjas cerca de las montañas. " +
      "llovió toda la noche pero el sol volvió a salir a media mañana. " +
      "la carta llegó el lunes y la respuesta fue escrita la misma semana. " +
      "cada año la familia viaja al mar y pasa el verano cerca del agua."),
    "fr" -> ("le rapide renard brun saute par dessus le chien paresseux pendant que les enfants regardent depuis la fenêtre. " +
      "ceci est une courte histoire sur le temps et les gens qui vivent dans la vieille ville au bord de la rivière. " +
      "nous devrions toujours nous souvenir que le savoir et la liberté vont ensemble dans chaque pays libre. " +
      "les étudiants lisent leurs livres à la bibliothèque et parlent chaque après midi de histoire et de science. " +
      "il fut un temps où le monde semblait beaucoup plus grand et chaque voyage durait de longues semaines. " +
      "on dit que le monde appartient à ceux qui se lèvent tôt mais la patience est aussi une grande vertu. " +
      "les bons amis se soutiennent dans les moments difficiles et partagent ensemble les bons moments. " +
      "le gouvernement a annoncé un nouveau plan pour les écoles et les hôpitaux de tout le pays. " +
      "le matin elle boit une tasse de café et mange du pain avec du beurre et du miel. " +
      "le train quitte la gare à sept heures et arrive en ville deux heures plus tard. " +
      "mon frère joue du piano et ma soeur chante de vieilles chansons le soir. " +
      "le marché vend des fruits frais et des légumes des fermes près des montagnes. " +
      "il a plu toute la nuit mais le soleil est revenu à la fin de la matinée. " +
      "la lettre est arrivée lundi et la réponse fut écrite la même semaine. " +
      "chaque année la famille voyage vers la mer et passe la saison chaude près des vagues."),
    "it" -> ("la veloce volpe marrone salta sopra il cane pigro mentre i bambini guardano dalla finestra. " +
      "questa è una breve storia sul tempo e sulla gente che vive nella città vecchia lungo il fiume. " +
      "dovremmo sempre ricordare che il sapere e la libertà vanno insieme in ogni paese libero. " +
      "gli studenti leggono i loro libri in biblioteca e parlano ogni pomeriggio di storia e di scienza. " +
      "ci fu un tempo in cui il mondo sembrava molto più grande e ogni viaggio durava molte settimane. " +
      "si dice che chi dorme non piglia pesci ma anche la pazienza è una grande virtù. " +
      "i buoni amici si aiutano nei momenti difficili e condividono insieme i momenti felici. " +
      "il governo ha annunciato un nuovo piano per le scuole e gli ospedali di tutto il paese. " +
      "la mattina lei beve una tazza di caffè e mangia pane con burro e miele. " +
      "il treno parte dalla stazione alle sette e arriva in città due ore dopo. " +
      "mio fratello suona il pianoforte e mia sorella canta vecchie canzoni la sera. " +
      "il mercato vende frutta fresca e verdura delle fattorie vicino alle montagne. " +
      "è piovuto tutta la notte ma il sole è tornato a metà mattina. " +
      "la lettera è arrivata lunedì e la risposta fu scritta la stessa settimana. " +
      "ogni anno la famiglia viaggia verso il mare e passa la estate vicino alla acqua."),
    "pt" -> ("a rápida raposa marrom salta sobre o cão preguiçoso enquanto as crianças observam da janela. " +
      "esta é uma história curta sobre o tempo e as pessoas que vivem na cidade velha junto ao rio. " +
      "devemos sempre lembrar que o conhecimento e a liberdade andam juntos em cada país livre. " +
      "os estudantes leem os seus livros na biblioteca e falam todas as tardes de história e de ciência. " +
      "houve um tempo em que o mundo parecia muito maior e cada viagem durava muitas semanas. " +
      "dizem que deus ajuda quem cedo madruga mas a paciência também é uma grande virtude. " +
      "os bons amigos se ajudam nos momentos difíceis e partilham juntos os bons momentos. " +
      "o governo anunciou um novo plano para as escolas e os hospitais de todo o país. " +
      "de manhã ela bebe uma xícara de café e come pão com manteiga e mel. " +
      "o trem sai da estação às sete e chega à cidade duas horas depois. " +
      "o meu irmão toca piano e a minha irmã canta velhas canções à noite. " +
      "o mercado vende fruta fresca e legumes das fazendas perto das montanhas. " +
      "choveu a noite toda mas o sol voltou a aparecer no meio da manhã. " +
      "a carta chegou na segunda feira e a resposta foi escrita na mesma semana. " +
      "todos os anos a família viaja para o mar e passa o verão perto da água."),
    "ru" -> ("быстрая коричневая лиса прыгает через ленивую собаку пока дети смотрят из окна. " +
      "это короткая история о погоде и людях которые живут в старом городе у реки. " +
      "мы всегда должны помнить что знание и свобода идут вместе в каждой свободной стране. " +
      "студенты читают свои книги в библиотеке и каждый день говорят об истории и науке. " +
      "было время когда мир казался намного больше и каждое путешествие длилось много недель. " +
      "говорят что кто рано встаёт тому бог подаёт но терпение тоже великая добродетель. " +
      "хорошие друзья помогают друг другу в трудные времена и делят вместе хорошие времена. " +
      "утром она пьёт чашку кофе и ест хлеб с маслом и мёдом. " +
      "поезд уходит с вокзала в семь и прибывает в город через два часа. " +
      "рынок продаёт свежие фрукты и овощи с ферм возле гор. " +
      "вечером город тихий и только ветер шумит в высоких деревьях у дороги. " +
      "письмо пришло в понедельник и ответ был написан на той же неделе. " +
      "каждый год семья едет к морю и проводит лето у воды. " +
      "мой брат играет на пианино а моя сестра поёт вечером старые песни. " +
      "на рынке можно купить хлеб молоко сыр и тёплые пироги с капустой. " +
      "зимой дети катаются на санках с горки а весной пускают кораблики по ручьям."))

  /** Trained model: languages in ascending order (the tie-break order),
    * per-language trigram→logp tables, per-language OOV log-probability.
    */
  final class Trained(
      val langs: Array[String],
      val logp: Array[java.util.HashMap[String, java.lang.Double]],
      val oov: Array[Double])
      extends Serializable

  /** Laplace-smoothed trigram model over the GLOBAL seed vocabulary:
    * `logp(tri|lang) = ln((count + 1) / (total_lang + V))`,
    * `oov(lang) = ln(1 / (total_lang + V))` with `V` = distinct trigrams
    * across ALL languages' seeds (a shared vocabulary keeps the smoothing
    * mass comparable across languages).
    */
  def train(seedTexts: Seq[(String, String)]): Trained = {
    require(seedTexts.map(_._1).distinct.size == seedTexts.size,
      "duplicate language in seeds")
    val sorted = seedTexts.sortBy(_._1)
    val perLang = sorted.map { case (lang, txt) =>
      val s = txt.toLowerCase(Locale.ROOT)
      val counts = new java.util.HashMap[String, Long]()
      var i = 0
      while (i + 3 <= s.length) {
        counts.merge(s.substring(i, i + 3), 1L, (a, b) => a + b)
        i += 1
      }
      (lang, counts)
    }
    val vocab = new java.util.HashSet[String]()
    perLang.foreach { case (_, c) => vocab.addAll(c.keySet()) }
    val v = vocab.size.toDouble
    val langs = sorted.map(_._1).toArray
    val logp = new Array[java.util.HashMap[String, java.lang.Double]](langs.length)
    val oov = new Array[Double](langs.length)
    perLang.zipWithIndex.foreach { case ((_, counts), li) =>
      var tot = 0.0
      counts.forEach((_, c) => tot += c.toDouble)
      val m = new java.util.HashMap[String, java.lang.Double](counts.size() * 2)
      counts.forEach((tri, c) =>
        m.put(tri, java.lang.Double.valueOf(math.log((c.toDouble + 1.0) / (tot + v)))))
      logp(li) = m
      oov(li) = math.log(1.0 / (tot + v))
    }
    new Trained(langs, logp, oov)
  }

  val model: Trained = train(seeds)
}

object LangIdKernel {

  val dataType: StructType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("avg_lp", DoubleType, nullable = false),
    StructField("margin", DoubleType, nullable = false),
    StructField("oov_gap", DoubleType, nullable = false),
    StructField("n_tri", IntegerType, nullable = false)))

  private val und = UTF8String.fromString("und")

  def eval(text: UTF8String): InternalRow = {
    val m = LangIdModel.model
    val s = text.toString.toLowerCase(Locale.ROOT)
    val nTri = s.length - 2
    if (nTri <= 0) return InternalRow(und, 0.0, 0.0, 0.0, 0)
    val k = m.langs.length
    val scores = new Array[Double](k)
    var i = 0
    while (i < nTri) {
      val tri = s.substring(i, i + 3)
      var l = 0
      while (l < k) {
        val lp = m.logp(l).get(tri)
        scores(l) += (if (lp == null) m.oov(l) else lp.doubleValue())
        l += 1
      }
      i += 1
    }
    // argmax + runner-up; langs are ascending, strictly-greater wins →
    // deterministic lowest-name tie-break
    var best = 0
    var l = 1
    while (l < k) {
      if (scores(l) > scores(best)) best = l
      l += 1
    }
    var second = Double.NegativeInfinity
    l = 0
    while (l < k) {
      if (l != best && scores(l) > second) second = scores(l)
      l += 1
    }
    val n = nTri.toDouble
    val margin = if (k < 2) 0.0 else (scores(best) - second) / n
    val avg = scores(best) / n
    InternalRow(UTF8String.fromString(m.langs(best)), avg, margin,
      avg - m.oov(best), nTri)
  }
}

case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("langid(text STRING) expected")
  override def dataType: DataType = LangIdKernel.dataType
  override def nullSafeEval(input: Any): Any =
    LangIdKernel.eval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdKernel.eval($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "langid"
}

object LangIdExpr {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "langid", exprs => LangIdExpr(exprs.head), "built-in")

  def langid(text: Column): Column = call_function("langid", text)
}
