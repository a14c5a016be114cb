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
