package graft

import graft.functions.LangId
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LangIdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("detects obvious samples of each profiled language") {
    assert(LangId.detect("the cat is in the house and it is warm") == "en")
    assert(LangId.detect("le chat est dans la maison et il fait chaud pour une nuit") == "fr")
    assert(LangId.detect("el gato es una mascota y los perros son animales con historia") == "es")
    assert(LangId.detect("der Hund ist ein Tier und die Katze ist nicht klein") == "de")
    assert(LangId.detect("") == "und")
    assert(LangId.detect(null) == "und")
    assert(LangId.detect("zzz qqq kkk 12345") == "und")
  }

  test("detects Latin-script languages added in round 5") {
    assert(LangId.detect("il gatto non è solo, che sono animali per una casa") == "it")
    assert(LangId.detect("het huis is mooi en ik ben niet met je meegegaan") == "nl")
    assert(LangId.detect("huset är stort och det är inte långt att gå för oss") == "sv")
    assert(LangId.detect("to nie jest dom, że się na drodze jest z nami") == "pl")
    assert(LangId.detect("bu bir ev ve çok güzel bir bahçe için buradayız değil mi") == "tr")
    assert(LangId.detect("rumah ini yang besar dan itu tidak jauh dengan jalan untuk kita") == "id")
    assert(LangId.detect("az ház nagy és nem kicsi, hogy egy kert is van benne") == "hu")
  }

  test("script-dominant languages resolve without word profiles") {
    assert(LangId.detect("这是一个很大的房子，花园也很漂亮") == "zh")
    assert(LangId.detect("これは大きな家です、庭もきれいです") == "ja")
    assert(LangId.detect("이것은 큰 집이고 정원도 아름답습니다") == "ko")
    assert(LangId.detect("αυτό είναι ένα μεγάλο σπίτι με ωραίο κήπο") == "el")
    assert(LangId.detect("זהו בית גדול עם גינה יפה מאוד") == "he")
    assert(LangId.detect("นี่คือบ้านหลังใหญ่มีสวนสวยงาม") == "th")
    assert(LangId.detect("यह एक बड़ा घर है और बगीचा सुंदर है") == "hi")
  }

  test("round-6 Latin profiles close the langdetect-set gap") {
    assert(LangId.detect("die huis is baie groot en ek het nie tyd vir als wat") == "af")
    assert(LangId.detect("mae'r tŷ yn fawr ac mae'r ardd wedi bod yn hardd") == "cy")
    assert(LangId.detect("som doma a už sme ste aj ako ale spolu") == "sk")
    assert(LangId.detect("hiša je velika in vrt je tudi lep kot vedno pa ki") == "sl")
    assert(LangId.detect("shtëpia është e madhe dhe një kopsht për të nga ne") == "sq")
    assert(LangId.detect("guriga waa weyn yahay iyo beerta waxaa jirta oo uu ku") == "so")
    assert(LangId.detect("nyumba ni kubwa na bustani ya maua kwa ajili ya kuwa hii") == "sw")
    assert(LangId.detect("ang bahay ay malaki at ang mga halaman ay maganda ito") == "tl")
  }

  test("Devanagari branches on orthography: hi / mr / ne") {
    assert(LangId.detect("यह एक बड़ा घर है और बगीचा सुंदर है") == "hi")
    assert(LangId.detect("हे घर खूप मोठे आहे आणि बाग सुंदर आहे, मुळे आणि फळे") == "mr")
    assert(LangId.detect("यो घर धेरै ठूलो छ र बगैंचा राम्रो छ") == "ne")
  }

  test("Cyrillic and Arabic branches disambiguate by orthography") {
    assert(LangId.detect("ова е голема куќа и градината е убава ѓубре") == "mk")
    assert(LangId.detect("это большой дом и сад очень красивый") == "ru")
    assert(LangId.detect("це великий будинок і сад дуже гарний") == "uk")
    assert(LangId.detect("това е голяма къща и градината е красива") == "bg")
    assert(LangId.detect("هذا بيت كبير والحديقة جميلة جدا") == "ar")
    assert(LangId.detect("این خانه بزرگ است و باغ زیبا است") == "fa")
  }

  test("mixed-script text with a Latin majority falls through to profiles") {
    assert(LangId.detect("the house 房子 is big and the garden is nice") == "en")
  }

  test("UDF applies distributed over a comments-like column") {
    val df = Seq("the weather is nice and the host was great",
                 "la maison est belle et le quartier est calme")
      .toDF("comments")
      .withColumn("review_lang", LangId.detectLang(substring($"comments", 1, 100)))
    assert(df.collect().map(_.getString(1)).toSeq == Seq("en", "fr"))
  }

  test("SQL registration works") {
    LangId.register(spark)
    val got = spark.sql("SELECT detect_lang('the house and the garden are big')")
      .collect().head.getString(0)
    assert(got == "en")
  }
}
