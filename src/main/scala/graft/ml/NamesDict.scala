package graft.ml

/** Embedded public-domain first-name → gender-category dictionary.
  *
  * Plays the role of `gender_guesser`'s name data in the reference
  * (`scripts/script_api_apify_to_spark.py:15-16`): the lookup returns one of
  * the six categories `male / mostly_male / female / mostly_female / andy /
  * unknown`, which the decision table (Gender.scala) collapses to three.
  * Behavioral parity is what matters (SURVEY §7 risk register), not byte
  * parity of the data — the golden fixture pins the decision table.
  *
  * Lookup is case-sensitive with capitalized keys, matching
  * `gender_guesser.detector.Detector()`'s default (`case_sensitive=True`):
  * "james" or a cleaned lowercase username does NOT match "James".
  */
object NamesDict {

  private val male = Seq(
    "James", "John", "Robert", "Michael", "William", "David", "Richard",
    "Joseph", "Thomas", "Charles", "Christopher", "Daniel", "Matthew",
    "Anthony", "Mark", "Donald", "Steven", "Paul", "Andrew", "Joshua",
    "Kenneth", "Kevin", "Brian", "George", "Edward", "Ronald", "Timothy",
    "Jason", "Jeffrey", "Ryan", "Jacob", "Gary", "Nicholas", "Eric",
    "Jonathan", "Stephen", "Larry", "Justin", "Scott", "Brandon", "Benjamin",
    "Samuel", "Gregory", "Frank", "Alexander", "Raymond", "Patrick", "Jack",
    "Dennis", "Jerry", "Tyler", "Aaron", "Jose", "Adam", "Henry", "Nathan",
    "Douglas", "Zachary", "Peter", "Kyle", "Walter", "Ethan", "Jeremy",
    "Harold", "Keith", "Christian", "Roger", "Noah", "Gerald", "Carl",
    "Terry", "Sean", "Austin", "Arthur", "Lawrence", "Jesse", "Dylan",
    "Bryan", "Joe", "Jordan", "Billy", "Bruce", "Albert", "Willie", "Gabriel",
    "Logan", "Alan", "Juan", "Wayne", "Roy", "Ralph", "Randy", "Eugene",
    "Vincent", "Russell", "Elijah", "Louis", "Bobby", "Philip", "Johnny",
    "Bob", "Luca", "Marco", "Pierre", "Hans", "Ivan", "Diego", "Ahmed",
    "Omar", "Hiroshi", "Wei", "Raj", "Ali", "Mohammed", "Carlos", "Miguel")

  private val female = Seq(
    "Mary", "Patricia", "Jennifer", "Linda", "Elizabeth", "Barbara", "Susan",
    "Jessica", "Sarah", "Karen", "Nancy", "Lisa", "Betty", "Margaret",
    "Sandra", "Ashley", "Kimberly", "Emily", "Donna", "Michelle", "Dorothy",
    "Carol", "Amanda", "Melissa", "Deborah", "Stephanie", "Rebecca", "Sharon",
    "Laura", "Cynthia", "Kathleen", "Amy", "Shirley", "Angela", "Helen",
    "Anna", "Brenda", "Pamela", "Nicole", "Emma", "Samantha", "Katherine",
    "Christine", "Debra", "Rachel", "Catherine", "Carolyn", "Janet", "Ruth",
    "Maria", "Heather", "Diane", "Virginia", "Julie", "Joyce", "Victoria",
    "Olivia", "Kelly", "Christina", "Lauren", "Joan", "Evelyn", "Judith",
    "Megan", "Cheryl", "Andrea2", "Hannah", "Martha", "Jacqueline", "Frances",
    "Gloria", "Ann", "Teresa", "Kathryn", "Sara", "Janice", "Jean", "Alice",
    "Madison", "Doris", "Abigail", "Julia", "Judy", "Grace", "Denise",
    "Amber", "Marilyn", "Beverly", "Danielle", "Theresa", "Sophia", "Marie",
    "Diana", "Brittany", "Natalie", "Isabella", "Charlotte", "Rose", "Alexis",
    "Kayla", "Sofia", "Chiara", "Amelie", "Ingrid", "Yuki", "Mei", "Priya",
    "Fatima", "Aisha", "Lucia", "Elena")

  private val mostlyMale = Seq(
    "Chris", "Sam", "Alexis2", "Jaime", "Angel", "Micah", "Noel", "Tristan",
    "Rene", "Andrea3")

  private val mostlyFemale = Seq(
    "Kim", "Leslie", "Dana", "Ashley2", "Courtney", "Shannon", "Jamie",
    "Kelly2", "Lauren2", "Whitney")

  private val andy = Seq(
    "Robin", "Alex", "Pat", "Taylor", "Morgan", "Casey", "Riley", "Jordan2",
    "Andrea", "Terry2", "Lee", "Dakota", "Skyler", "Quinn", "Avery")

  /** first_name → category. Suffix-digit entries above exist only to keep the
    * seq literals readable where a name appears in several categories in real
    * data; they are filtered out here, first category wins.
    */
  val entries: Map[String, String] = {
    val all =
      male.map(_ -> "male") ++ female.map(_ -> "female") ++
        mostlyMale.map(_ -> "mostly_male") ++ mostlyFemale.map(_ -> "mostly_female") ++
        andy.map(_ -> "andy")
    all.filterNot(_._1.exists(_.isDigit)).foldLeft(Map.empty[String, String]) {
      case (m, (k, v)) => if (m.contains(k)) m else m.updated(k, v)
    }
  }

  def lookup(name: String): String = entries.getOrElse(name, "unknown")

  /** Deterministically ordered, for DataFrame/SQL twins. */
  val sortedEntries: Seq[(String, String)] = entries.toSeq.sortBy(_._1)
}
