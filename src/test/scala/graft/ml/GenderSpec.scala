package graft.ml

import org.scalacheck.Gen

import graft.SparkSpec

/** Golden decision-table fixture + properties for F1 (FIXTURES.md §3). */
class GenderSpec extends SparkSpec {

  private val expected = Map(
    1 -> ("male", 0.9), 2 -> ("female", 0.9), 3 -> ("unknown", 0.5),
    4 -> ("male", 0.7), 5 -> ("unknown", 0.0), 6 -> ("unknown", 0.0),
    7 -> ("unknown", 0.0), 8 -> ("female", 0.7), 9 -> ("male", 0.7),
    10 -> ("unknown", 0.5), 11 -> ("female", 0.9), 12 -> ("unknown", 0.5),
    13 -> ("male", 0.9), 14 -> ("male", 0.9), 15 -> ("female", 0.7),
    16 -> ("unknown", 0.5), 17 -> ("unknown", 0.4),
    // I18N rows: native diacritics, decomposed input, soft hyphen, the
    // no-input-folding boundary, and the username regex eating the é
    18 -> ("male", 0.9), 19 -> ("male", 0.9), 20 -> ("female", 0.9),
    21 -> ("female", 0.9), 22 -> ("female", 0.9), 23 -> ("male", 0.9),
    24 -> ("unknown", 0.5), 25 -> ("male", 0.7))

  test("golden: pure function matches the reference decision table") {
    Gender.profiles.foreach { case (id, f, u) =>
      val got = Gender.guess(f, u)
      val (eg, ec) = expected(id)
      assert((got.predicted_gender, got.confidence) === ((eg, ec.toFloat)),
        s"profile $id ($f, $u)")
    }
  }

  test("golden: join form matches the decision table end-to-end") {
    val rows = GenderQueries.queries("q_gender_join")(spark, sf).collect()
    assert(rows.length === Gender.profiles.length)
    rows.foreach { r =>
      val (eg, ec) = expected(r.getInt(0))
      assert((r.getString(3), r.getDouble(4)) === ((eg, ec)), s"profile ${r.getInt(0)}")
    }
  }

  test("property: UDF tier ≡ join tier on arbitrary inputs") {
    val nameGen = Gen.oneOf(
      Gen.oneOf(NamesDict.sortedEntries.map(_._1)),
      Gen.alphaStr.map(_.take(12)),
      Gen.const(null: String), Gen.const(""), Gen.const("  "))
    val userGen = Gen.oneOf(
      Gen.oneOf(NamesDict.sortedEntries.map(_._1 + "_42")),
      Gen.alphaNumStr.map(_.take(12)),
      Gen.const(null: String), Gen.const("!!!"))
    val cases = Gen.listOfN(60, Gen.zip(nameGen, userGen)).sample.get
      .zipWithIndex.map { case ((f, u), i) => (i, f, u) }

    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      cases.map { case (i, f, u) => org.apache.spark.sql.Row(i, f, u) }.asJava,
      Gender.profilesDF(spark).schema)
    val joinForm = Gender.withGender(spark, df)
      .select("id", "predicted_gender", "confidence").collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    cases.foreach { case (i, f, u) =>
      val g = Gender.guess(f, u)
      assert(joinForm(i) === ((g.predicted_gender,
        BigDecimal(g.confidence.toDouble).setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble)),
        s"case $i ($f, $u)")
    }
  }

  test("breadth panel: out-of-fixture names resolve through the extended dictionary") {
    // none of these first names appear in the 17 golden profiles — they
    // exercise the round-5 breadth extension (international coverage and
    // the mostly_*/andy tiers) end-to-end through the decision table
    val panel = Seq(
      ("Sebastian Vettel", "male", 0.9f), ("Priyanka Chopra", "female", 0.9f),
      ("Wolfgang Amadeus", "male", 0.9f), ("Svetlana Petrova", "female", 0.9f),
      ("Giovanni Ferrari", "male", 0.9f), ("Ingeborg Bachmann", "female", 0.9f),
      ("Kwame Mensah", "male", 0.9f), ("Ngozi Adichie", "female", 0.9f),
      ("Mahmoud Darwish", "male", 0.9f), ("Zeynep Kaya", "female", 0.9f),
      ("Rajesh Kumar", "male", 0.9f), ("Anjali Sharma", "female", 0.9f),
      ("Satoshi Nakamoto", "male", 0.9f), ("Yukiko Tanaka", "female", 0.9f),
      ("Harper Lee", "female", 0.9f), // mostly_female tier
      ("Hayden Fox", "male", 0.9f), // mostly_male tier
      ("Oakley Smith", "unknown", 0.5f), // andy tier
      ("Zxcvb Qwerty", "unknown", 0.5f), // still a dictionary miss
      // I18N tier: native diacritic entries...
      ("François Truffaut", "male", 0.9f), ("Céline Dion", "female", 0.9f),
      ("Jürgen Klopp", "male", 0.9f), ("Sofía Vergara", "female", 0.9f),
      ("Raúl González", "male", 0.9f), ("Anaïs Nin", "female", 0.9f),
      // ...folded ASCII aliases of diacritic entries resolve too...
      ("Francois Plain", "male", 0.9f), ("Celine Plain", "female", 0.9f),
      ("Anais Plain", "female", 0.9f),
      // ...and unlisted diacritic spellings stay unknown (no input folding)
      ("Dàvid Unlisted", "unknown", 0.5f))
    panel.foreach { case (fullName, g, c) =>
      val got = Gender.guess(fullName, "x1")
      assert((got.predicted_gender, got.confidence) === ((g, c)), fullName)
    }
    assert(NamesDict.entries.size >= 1500,
      s"breadth extension missing: ${NamesDict.entries.size} entries")
  }

  test("non-Latin script panel: native-script entries resolve; Han given names stay unknown by design") {
    // round-7 breadth: un-transliterated profiles in Cyrillic, Greek,
    // Arabic, Devanagari, Hangul, and Hebrew scripts resolve directly —
    // the reference's gender_guesser would return unknown for most of
    // these. Han-character names are the DOCUMENTED exception: a single
    // hanzi rarely determines gender, so the dictionary deliberately
    // carries none and the decision table reports unknown rather than
    // guessing (transliteration-or-unknown).
    val panel = Seq(
      ("Александр Пушкин", "male", 0.9f), ("Мария Шарапова", "female", 0.9f),
      ("Γιώργος Σεφέρης", "male", 0.9f), ("Ελένη Παππά", "female", 0.9f),
      ("محمد صلاح", "male", 0.9f), ("فاطمة الزهراء", "female", 0.9f),
      ("राहुल गांधी", "male", 0.9f), ("प्रिया शर्मा", "female", 0.9f),
      ("민준 김", "male", 0.9f), ("서연 이", "female", 0.9f),
      ("משה כהן", "male", 0.9f), ("שרה לוי", "female", 0.9f),
      // romanized long-tail locales added this round
      ("Aarav Patel", "male", 0.9f), ("Seoyeon Park", "female", 0.9f),
      ("Mehmet Yilmaz", "male", 0.9f), ("Aminata Diallo", "female", 0.9f),
      ("Dmitri Ivanov", "male", 0.9f), ("Agnieszka Nowak", "female", 0.9f),
      // unisex locale names land in the cautious tiers, not a guess
      ("Makoto Shinkai", "unknown", 0.5f), // andy
      ("Linh Nguyen", "female", 0.9f), // mostly_female
      // Han given name: unknown by design
      ("伟 王", "unknown", 0.5f))
    panel.foreach { case (fullName, g, c) =>
      val got = Gender.guess(fullName, "x1")
      assert((got.predicted_gender, got.confidence) === ((g, c)), fullName)
    }
    assert(NamesDict.entries.size >= 2100,
      s"round-7 breadth missing: ${NamesDict.entries.size} entries")
  }

  test("round-8 tranche: new locales resolve; native-script names OUTSIDE the dict are unknown, never a transliteration guess") {
    val panel = Seq(
      // Romance Europe / Latin America / Greece / Iran / South Asia /
      // Thailand / Slavic / Nordic — the round-8 census-style tranche
      ("Alessandro Rossi", "male", 0.9f), ("Giulia Bianchi", "female", 0.9f),
      ("Antoine Dubois", "male", 0.9f), ("Isabelle Moreau", "female", 0.9f),
      ("Santiago Alvarez", "male", 0.9f), ("Ximena Soto", "female", 0.9f),
      ("Joao Silva", "male", 0.9f), ("Carolina Santos", "female", 0.9f),
      ("Giorgos Papadopoulos", "male", 0.9f), ("Eleni Georgiou", "female", 0.9f),
      ("Reza Ahmadi", "male", 0.9f), ("Maryam Hosseini", "female", 0.9f),
      ("Usman Khan", "male", 0.9f), ("Ayesha Malik", "female", 0.9f),
      ("Somchai Srisuwan", "male", 0.9f), ("Siriporn Chaiyasit", "female", 0.9f),
      ("Ilya Petrov", "male", 0.9f), ("Oksana Kovalenko", "female", 0.9f),
      ("Astrid Lindgren", "female", 0.9f), ("Corazon Aquino", "female", 0.9f),
      // deliberately-resolved ambiguous name (documented in NamesDict):
      // Nicola = mostly_male, collapsing like its majority
      ("Nicola Conte", "male", 0.9f),
      ("Camille Laurent", "female", 0.9f), // pre-existing female entry wins
      ("Jules Verne", "male", 0.9f), // pre-existing mostly_male entry wins
      // transliteration-or-unknown: a native-script name OUTSIDE the
      // dictionary must return unknown — the engine never guesses via a
      // silent transliteration — while its romanized form resolves
      ("Ярослав Мудрый", "unknown", 0.5f),
      ("Yaroslav Kovalenko", "male", 0.9f),
      ("Νικηφόρος Φωκάς", "unknown", 0.5f))
    panel.foreach { case (fullName, g, c) =>
      val got = Gender.guess(fullName, "x1")
      assert((got.predicted_gender, got.confidence) === ((g, c)), fullName)
    }
    assert(NamesDict.entries.size >= 2400,
      s"round-8 tranche missing: ${NamesDict.entries.size} entries")
  }

  test("round-9 tranche: Central Asia/Caucasus/Balkans/Baltics/Celtic/Pacific/Africa resolve; new scripts honor transliteration-or-unknown") {
    val panel = Seq(
      ("Nursultan Abishev", "male", 0.9f), ("Aigerim Satpaeva", "female", 0.9f),
      ("Rustam Karimov", "male", 0.9f), ("Nargiza Yusupova", "female", 0.9f),
      ("Armen Sargsyan", "male", 0.9f), ("Anahit Petrosyan", "female", 0.9f),
      ("Giorgi Beridze", "male", 0.9f), ("Tamar Gelashvili", "female", 0.9f),
      ("Dritan Hoxha", "male", 0.9f), ("Valbona Krasniqi", "female", 0.9f),
      ("Mihai Popescu", "male", 0.9f), ("Ioana Ionescu", "female", 0.9f),
      ("Georgi Dimitrov", "male", 0.9f), ("Desislava Petrova", "female", 0.9f),
      ("Mindaugas Kazlauskas", "male", 0.9f), ("Egle Petrauskaite", "female", 0.9f),
      ("Mikko Virtanen", "male", 0.9f), ("Aino Korhonen", "female", 0.9f),
      ("Laszlo Kovacs", "male", 0.9f), ("Katalin Nagy", "female", 0.9f),
      ("Aung Thura", "male", 0.9f), ("Bolormaa Erdene", "female", 0.9f),
      ("Rhys Williams", "male", 0.9f), ("Angharad Jones", "female", 0.9f),
      ("Tadhg Murphy", "male", 0.9f), ("Saoirse Ronan", "female", 0.9f),
      ("Sione Tuilagi", "male", 0.9f), ("Leilani Kealoha", "female", 0.9f),
      ("Juma Hassan", "male", 0.9f), ("Rehema Mwangi", "female", 0.9f),
      ("Dawit Tesfaye", "male", 0.9f), ("Tigist Abebe", "female", 0.9f),
      ("Chukwudi Okafor", "male", 0.9f), ("Ngozi Adichie", "female", 0.9f),
      // new native scripts resolve directly…
      ("Володимир Шевченко", "male", 0.9f), ("Оксана Франко", "female", 0.9f),
      ("สมชาย ใจดี", "male", 0.9f), ("ศิริพร สวัสดี", "female", 0.9f),
      ("அருண் குமார்", "male", 0.9f), ("প্রিয়া হক", "female", 0.9f),
      ("Արմեն Գրիգորյան", "male", 0.9f), ("თამარ წერეთელი", "female", 0.9f),
      // …and out-of-dict native-script names stay unknown, never a
      // transliteration guess (ตะวัน / ლაშა are real names NOT entered)
      ("ตะวัน พงษ์", "unknown", 0.5f), ("ლაშა მაისურაძე", "unknown", 0.5f))
    panel.foreach { case (fullName, g, c) =>
      val got = Gender.guess(fullName, "x1")
      assert((got.predicted_gender, got.confidence) === ((g, c)), fullName)
    }
    assert(NamesDict.entries.size >= 2800,
      s"round-9 tranche missing: ${NamesDict.entries.size} entries")
  }

  test("round-10 tranche: Low Countries/Lusophone/Slavic-deep/SE-Asia/Africa/Caribbean resolve; kana+fidel+Sinhala honor transliteration-or-unknown") {
    val panel = Seq(
      ("Daan de Vries", "male", 0.9f), ("Sanne Bakker", "female", 0.9f),
      ("Joao Carvalho", "male", 0.9f), ("Mariana Ferreira", "female", 0.9f),
      ("Thiago Souza", "male", 0.9f), ("Larissa Oliveira", "female", 0.9f),
      ("Wojciech Nowak", "male", 0.9f), ("Malgorzata Kowalska", "female", 0.9f),
      ("Ondrej Svoboda", "male", 0.9f), ("Tereza Novakova", "female", 0.9f),
      ("Budi Santoso", "male", 0.9f), ("Siti Rahayu", "female", 0.9f),
      ("Khairul Anwar", "male", 0.9f), ("Nurul Huda", "female", 0.9f),
      ("Bayani Reyes", "male", 0.9f), ("Corazon Aquino", "female", 0.9f),
      ("Nuwan Perera", "male", 0.9f), ("Sanduni Silva", "female", 0.9f),
      ("Prakash Shrestha", "male", 0.9f), ("Sarita Gurung", "female", 0.9f),
      ("Veasna Chan", "male", 0.9f), ("Sophea Kim", "female", 0.9f),
      ("Kwame Mensah", "male", 0.9f), ("Akosua Boateng", "female", 0.9f),
      ("Babatunde Adeyemi", "male", 0.9f), ("Chioma Eze", "female", 0.9f),
      ("Abubakar Bello", "male", 0.9f), ("Hadiza Garba", "female", 0.9f),
      ("Sipho Dlamini", "male", 0.9f), ("Thandiwe Khumalo", "female", 0.9f),
      ("Tendai Moyo", "male", 0.9f), ("Rudo Ncube", "female", 0.9f),
      ("Abdirahman Ali", "male", 0.9f), ("Hodan Yusuf", "female", 0.9f),
      ("Dieudonne Pierre", "male", 0.9f), ("Fabienne Joseph", "female", 0.9f),
      // new native scripts resolve directly…
      ("たろう 田中", "male", 0.9f), ("はなこ 山田", "female", 0.9f),
      ("නුවන් පෙරේරා", "male", 0.9f), ("සඳුනි සිල්වා", "female", 0.9f),
      ("ዳዊት ተክለ", "male", 0.9f), ("ትግስት አለሙ", "female", 0.9f),
      ("Милош Јовановић", "male", 0.9f), ("Милица Петровић", "female", 0.9f),
      // …and out-of-dict native-script names stay unknown, never a
      // transliteration guess (けんた / ሳሙኤል are real names NOT entered)
      ("けんた 佐藤", "unknown", 0.5f), ("ሳሙኤል ገብረ", "unknown", 0.5f))
    panel.foreach { case (fullName, g, c) =>
      val got = Gender.guess(fullName, "x1")
      assert((got.predicted_gender, got.confidence) === ((g, c)), fullName)
    }
    assert(NamesDict.entries.size >= 3200,
      s"round-10 tranche missing: ${NamesDict.entries.size} entries")
  }

  test("round-10 second tranche: Asia-depth panel resolves, native-script twins agree, unisex stays out") {
    val panel = Seq(
      ("Murugan Pillai", "male", 0.9f), ("Meenakshi Iyer", "female", 0.9f),
      ("Imran Khan", "male", 0.9f), ("Ayesha Siddiqui", "female", 0.9f),
      ("Hiroshi Tanaka", "male", 0.9f), ("Sakura Sato", "female", 0.9f),
      ("Jihoon Park", "male", 0.9f), ("Minji Kim", "female", 0.9f),
      ("Jianguo Wang", "male", 0.9f), ("Xiuying Li", "female", 0.9f),
      ("Somchai Srisuk", "male", 0.9f), ("Siriporn Chai", "female", 0.9f),
      ("Dariush Farahani", "male", 0.9f), ("Parisa Moradi", "female", 0.9f),
      ("Gennaro Esposito", "male", 0.9f), ("Concetta Russo", "female", 0.9f),
      // native-script twins of romanized entries resolve identically
      ("民호 김", "unknown", 0.5f), // mixed-script garbage stays unknown
      ("민호 김", "male", 0.9f), ("지은 이", "female", 0.9f),
      ("สมชาย ศรี", "male", 0.9f), ("สมศรี ศรี", "female", 0.9f),
      ("राजेश कुमार", "male", 0.9f), ("सीता देवी", "female", 0.9f),
      // deliberately-omitted unisex names stay unknown, not guessed
      ("Harpreet Kaur", "unknown", 0.5f), ("Gurpreet Singh", "unknown", 0.5f),
      ("Phuong Nguyen", "unknown", 0.5f))
    panel.foreach { case (fullName, g, c) =>
      val got = Gender.guess(fullName, "x1")
      assert((got.predicted_gender, got.confidence) === ((g, c)), fullName)
    }
    assert(NamesDict.entries.size >= 3450,
      s"round-10 second tranche missing: ${NamesDict.entries.size} entries")
  }

  test("round-11 tranche: Gaelic/Iceland/Finland/Balkans/Central-Asia/Mongolia/Korea/Myanmar/East-Africa/Ethiopia resolve; unisex stays out") {
    val panel = Seq(
      ("Seamus O'Brien", "male", 0.9f), ("Saoirse Ronan", "female", 0.9f),
      ("Hamish MacLeod", "male", 0.9f), ("Eilidh Campbell", "female", 0.9f),
      ("Sigurdur Jonsson", "male", 0.9f), ("Sigridur Olafsdottir", "female", 0.9f),
      ("Tapio Virtanen", "male", 0.9f), ("Tuula Korhonen", "female", 0.9f),
      ("Aleksandar Petrovic", "male", 0.9f), ("Milica Jovanovic", "female", 0.9f),
      ("Hrvoje Horvat", "male", 0.9f), ("Lejla Hodzic", "female", 0.9f),
      ("Primoz Zupan", "male", 0.9f), ("Urska Kovac", "female", 0.9f),
      ("Blerim Krasniqi", "male", 0.9f), ("Valbona Berisha", "female", 0.9f),
      ("Sherzod Karimov", "male", 0.9f), ("Dilnoza Yusupova", "female", 0.9f),
      ("Daniyar Seitkali", "male", 0.9f), ("Aigul Nurlanovna", "female", 0.9f),
      ("Batbold Erdenebat", "male", 0.9f), ("Bolormaa Tsend", "female", 0.9f),
      ("Min-jun Park", "male", 0.9f), ("Seo-yeon Kim", "female", 0.9f),
      ("Kyaw Win", "male", 0.9f), ("Thandar Aye", "female", 0.9f),
      ("Mwangi Kamau", "male", 0.9f), ("Wanjiru Njeri", "female", 0.9f),
      ("Ochieng Otieno", "male", 0.9f), ("Achieng Adhiambo", "female", 0.9f),
      ("Kipchoge Keino", "male", 0.9f), ("Chebet Kiplagat", "female", 0.9f),
      ("Tesfaye Bekele", "male", 0.9f), ("Tigist Alemu", "female", 0.9f),
      // native-script twins of romanized entries resolve identically
      ("민준 박", "male", 0.9f), ("서연 김", "female", 0.9f),
      ("Баатар Ганбат", "male", 0.9f), ("Болормаа Цэнд", "female", 0.9f),
      ("ተስፋዬ በቀለ", "male", 0.9f), ("አልማዝ ገብረ", "female", 0.9f),
      ("ကျော် ဝင်း", "male", 0.9f), ("သန္တာ အေး", "female", 0.9f),
      ("ლევანი კიკნაძე", "male", 0.9f), ("ნინო ბერიძე", "female", 0.9f),
      // deliberately-omitted unisex names stay unknown, not guessed
      ("Tenzin Wangchuk", "unknown", 0.5f), ("Ji-woo Lee", "unknown", 0.5f),
      ("Moe Aung", "unknown", 0.5f),
      // out-of-dict native-script names stay unknown, never a
      // transliteration guess (지우 / መሰረት are real names NOT entered)
      ("지우 이", "unknown", 0.5f), ("መሰረት አበበ", "unknown", 0.5f))
    panel.foreach { case (fullName, g, c) =>
      val got = Gender.guess(fullName, "x1")
      assert((got.predicted_gender, got.confidence) === ((g, c)), fullName)
    }
    assert(NamesDict.entries.size >= 3750,
      s"round-11 tranche missing: ${NamesDict.entries.size} entries")
  }

  test("round-12 tranche: depth pools resolve (old-stock Europe, South India, Korea/Japan, Pacific, South Sudan, Israel); new Dravidian scripts honor transliteration-or-unknown") {
    val panel = Seq(
      ("Pasquale Esposito", "male", 0.9f), ("Filomena Greco", "female", 0.9f),
      ("Anselmo Duarte", "male", 0.9f), ("Milagros Fernandez", "female", 0.9f),
      ("Gottfried Leibniz", "male", 0.9f), ("Hannelore Schmidt", "female", 0.9f),
      ("Hippolyte Taine", "male", 0.9f), ("Bernadette Soubirous", "female", 0.9f),
      ("Rodion Raskolnikov", "male", 0.9f), ("Varvara Petrovna", "female", 0.9f),
      ("Stavros Niarchos", "male", 0.9f), ("Kalliopi Papadaki", "female", 0.9f),
      ("Joaquim Barbosa", "male", 0.9f), ("Madalena Costa", "female", 0.9f),
      ("Kazimierz Pulaski", "male", 0.9f), ("Jadwiga Kowalczyk", "female", 0.9f),
      ("Torbjorn Hansen", "male", 0.9f), ("Solveig Berg", "female", 0.9f),
      ("Ghassan Kanafani", "male", 0.9f), ("Zainab Hussein", "female", 0.9f),
      ("Parviz Tehrani", "male", 0.9f), ("Shirin Ebadi", "female", 0.9f),
      ("Gokhan Yilmaz", "male", 0.9f), ("Ozlem Demir", "female", 0.9f),
      ("Saravanan Muthu", "male", 0.9f), ("Rajalakshmi Raman", "female", 0.9f),
      ("Souvik Banerjee", "male", 0.9f), ("Gitanjali Das", "female", 0.9f),
      ("Dong-hyun Choi", "male", 0.9f), ("Hye-jin Yoon", "female", 0.9f),
      ("Tadashi Yamamoto", "male", 0.9f), ("Sachiko Watanabe", "female", 0.9f),
      ("Bambang Wijaya", "male", 0.9f), ("Kartini Sari", "female", 0.9f),
      ("Thanawat Suwan", "male", 0.9f), ("Kanokwan Phong", "female", 0.9f),
      ("Cuong Tran", "male", 0.9f), ("Quynh Le", "female", 0.9f),
      ("Tamati Walker", "male", 0.9f), ("Mereana Hohepa", "female", 0.9f),
      ("Mosese Rabuka", "male", 0.9f), ("Salote Tupou", "female", 0.9f),
      ("Gatluak Thon", "male", 0.9f), ("Nyibol Deng", "female", 0.9f),
      ("Mulugeta Haile", "male", 0.9f), ("Meseret Defar", "female", 0.9f),
      ("Nadav Lapid", "male", 0.9f), ("Efrat Mishori", "female", 0.9f),
      // native-script twins: Telugu/Kannada/Malayalam join the script set
      ("వెంకటేశ్ రావు", "male", 0.9f), ("లక్ష్మి దేవి", "female", 0.9f),
      ("ರಾಜೇಶ ಗೌಡ", "male", 0.9f), ("ಗೀತಾ ಹೆಗಡೆ", "female", 0.9f),
      ("അരുൺ നായർ", "male", 0.9f), ("ദീപ മേനോൻ", "female", 0.9f),
      ("נדב כהן", "male", 0.9f), ("שירה לוי", "female", 0.9f),
      // deliberately-omitted unisex names stay unknown, not guessed
      ("Xuan Nguyen", "unknown", 0.5f), ("Cemre Aydin", "unknown", 0.5f),
      ("Manaia Parata", "unknown", 0.5f),
      // "Nino" stays out entirely: male in Italian, female in Georgian
      ("Nino Benvenuti", "unknown", 0.5f),
      // out-of-dict native-script names stay unknown, never a
      // transliteration guess (సురేష్ / ಸುರೇಶ are real names NOT entered)
      ("సురేష్ రెడ్డి", "unknown", 0.5f), ("ಸುರೇಶ ಶೆಟ್ಟಿ", "unknown", 0.5f))
    panel.foreach { case (fullName, g, c) =>
      val got = Gender.guess(fullName, "x1")
      assert((got.predicted_gender, got.confidence) === ((g, c)), fullName)
    }
    assert(NamesDict.entries.size >= 4300,
      s"round-12 tranche missing: ${NamesDict.entries.size} entries")
  }

  test("property: outputs confined to the reference domains") {
    val gen = Gen.zip(Gen.asciiPrintableStr, Gen.asciiPrintableStr)
    (1 to 300).foreach { seed =>
      gen.sample.foreach { case (f, u) =>
        val g = Gender.guess(f, u)
        assert(Set("male", "female", "unknown").contains(g.predicted_gender))
        assert(Set(0.0f, 0.4f, 0.5f, 0.7f, 0.9f).contains(g.confidence))
      }
    }
  }
}
