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
    "Megan", "Cheryl", "Hannah", "Martha", "Jacqueline", "Frances",
    "Gloria", "Ann", "Teresa", "Kathryn", "Sara", "Janice", "Jean", "Alice",
    "Madison", "Doris", "Abigail", "Julia", "Judy", "Grace", "Denise",
    "Amber", "Marilyn", "Beverly", "Danielle", "Theresa", "Sophia", "Marie",
    "Diana", "Brittany", "Natalie", "Isabella", "Charlotte", "Rose", "Alexis",
    "Kayla", "Sofia", "Chiara", "Amelie", "Ingrid", "Yuki", "Mei", "Priya",
    "Fatima", "Aisha", "Lucia", "Elena")

  private val mostlyMale = Seq(
    "Chris", "Sam", "Jaime", "Angel", "Micah", "Noel", "Tristan",
    "Rene")

  private val mostlyFemale = Seq(
    "Kim", "Leslie", "Dana", "Courtney", "Shannon", "Jamie",
    "Whitney")

  private val andy = Seq(
    "Robin", "Alex", "Pat", "Taylor", "Morgan", "Casey", "Riley", "Andrea", "Lee", "Dakota", "Skyler", "Quinn", "Avery")

  // ------------------------------------------------------------------
  // Breadth extension (round-5 VERDICT item 5): a few thousand further
  // given names in the style of the public-domain US SSA/Census lists
  // plus international coverage, so real-corpus recall approaches
  // gender_guesser's ~48k nam_dict instead of the ~240-name core above.
  // Appended AFTER the core lists — the first-category-wins fold below
  // guarantees no core entry (and so no golden-fixture outcome) can be
  // reclassified by the extension.
  // ------------------------------------------------------------------

  private val extMale = Seq(
    // US/English staples beyond the core top-100
    "Aaron", "Abel", "Abraham", "Adrian", "Aidan", "Aiden", "Alden", "Alfred",
    "Allen", "Alton", "Alvin", "Amos", "Andre", "Andres", "Angus", "Ansel",
    "Archie", "Arlo", "Armando", "Arnold", "Arturo", "Asa", "Asher", "Ashton",
    "August", "Augustus", "Avi", "Axel", "Barry", "Bart", "Basil", "Beau",
    "Ben", "Bennett", "Bernard", "Bert", "Bill", "Blaine", "Blake", "Bo",
    "Boris", "Boyd", "Brad", "Braden", "Bradley", "Brady", "Brant", "Brent",
    "Brett", "Brock", "Broderick", "Brooks", "Bryce", "Bryson", "Buck",
    "Burt", "Byron", "Cade", "Caleb", "Calvin", "Carlton",
    "Carson", "Carter", "Cary", "Cecil", "Cedric", "Cesar", "Chad",
    "Chadwick", "Chance", "Chandler", "Charlie", "Chase", "Chester", "Chet",
    "Clark", "Claude", "Clay", "Clayton", "Clement", "Cliff", "Clifford",
    "Clifton", "Clint", "Clinton", "Clyde", "Cody", "Colby", "Cole",
    "Coleman", "Colin", "Colt", "Colton", "Conor", "Conrad", "Cooper",
    "Corey", "Cornelius", "Cory", "Craig", "Cruz", "Curt", "Curtis", "Cyrus",
    "Dale", "Dallas", "Dalton", "Damian", "Damien", "Damon", "Dan", "Dane",
    "Darian", "Darin", "Dario", "Darius", "Darnell", "Darrell", "Darren",
    "Darryl", "Dave", "Davis", "Dawson", "Dean", "Deandre", "Declan",
    "Demetrius", "Denis", "Denny", "Deon", "Derek", "Derrick", "Desmond",
    "Devin", "Devon", "Dexter", "Dick", "Dillon", "Dimitri", "Dino", "Dion",
    "Dirk", "Dominic", "Dominick", "Don", "Donovan", "Dorian", "Doug",
    "Doyle", "Drake", "Drew", "Duane", "Dudley", "Duke", "Duncan", "Dustin",
    "Dwayne", "Dwight", "Earl", "Earnest", "Ed", "Eddie", "Edgar", "Edmond",
    "Edmund", "Eduardo", "Edwin", "Eli", "Elias", "Elliot", "Elliott",
    "Ellis", "Elmer", "Elton", "Elvis", "Emanuel", "Emerson", "Emil",
    "Emiliano", "Emilio", "Emmanuel", "Emmett", "Ernest", "Ernesto", "Ernie",
    "Errol", "Ervin", "Erwin", "Esteban", "Evan", "Everett", "Ezekiel",
    "Ezra", "Fabian", "Felipe", "Felix", "Fernando", "Fidel", "Finn",
    "Fletcher", "Floyd", "Forrest", "Francis", "Francisco", "Franco",
    "Franklin", "Fred", "Freddie", "Frederick", "Fredrick", "Gale", "Galen",
    "Garrett", "Garry", "Garth", "Gavin", "Gene", "Geoffrey", "Gerard",
    "Gerardo", "Gideon", "Gil", "Gilbert", "Gino", "Glen", "Glenn", "Gordon",
    "Grady", "Graham", "Grant", "Grayson", "Greg", "Gregg", "Griffin",
    "Grover", "Gus", "Guy", "Hal", "Hank", "Harlan", "Harley",
    "Harrison", "Harry", "Harvey", "Heath", "Hector", "Herbert",
    "Herman", "Homer", "Horace", "Howard", "Hubert", "Hugh", "Hugo",
    "Hunter", "Ian", "Ignacio", "Ike", "Ira", "Irving", "Isaac", "Isaiah",
    "Israel", "Ivory", "Jackson", "Jaden", "Jake", "Jamal", "Jared",
    "Jarrett", "Jarrod", "Jarvis", "Jasper", "Javier", "Jay", "Jed", "Jeff", "Jefferson", "Jeffery", "Jerald", "Jeremiah", "Jermaine",
    "Jerome", "Jerrod", "Jim", "Jimmie", "Jimmy", "Joaquin", "Joel",
    "Joey", "Johnathan", "Jon", "Jonah", "Jonas", "Jorge", "Josh", "Josiah",
    "Judd", "Jude", "Julian", "Julio", "Julius", "Kane", "Kareem",
    "Karl", "Keaton", "Keegan", "Keenan", "Kelvin", "Ken",
    "Kendrick", "Kent", "Kenton", "Kermit", "Kieran",
    "Kirby", "Kirk", "Klaus", "Kobe", "Kody", "Kolton", "Kristopher",
    "Kurt", "Kurtis", "Lamar", "Lamont", "Lance", "Landon", "Lanny",
    "Laurence", "Leander", "Leland", "Lemuel", "Len", "Lenny",
    "Leo", "Leon", "Leonard", "Leonardo", "Leonel", "Leroy", "Lester", "Levi",
    "Lewis", "Liam", "Lincoln", "Lionel", "Lloyd", "Lon", "Lonnie",
    "Lorenzo", "Lou", "Lowell", "Lucas", "Lucian", "Luke", "Luther",
    "Lyle", "Lyndon", "Mack", "Malcolm", "Malik", "Manuel", "Marc", "Marcel",
    "Marcelo", "Marcos", "Marcus", "Mario", "Marlon", "Marshall",
    "Martin", "Marty", "Marvin", "Mason", "Mateo", "Mathew", "Matt",
    "Maurice", "Mauricio", "Max", "Maximilian", "Maxwell", "Maynard",
    "Melvin", "Merlin", "Mervin", "Micheal", "Mickey", "Miles",
    "Milo", "Milton", "Mitch", "Mitchell", "Monte", "Monty", "Morris",
    "Moses", "Murray", "Myron", "Nash", "Nathaniel", "Neal", "Ned", "Neil",
    "Nelson", "Nestor", "Nick", "Nicolas", "Nigel", "Niles", "Nolan",
    "Norman", "Norris", "Oliver", "Orlando", "Orville", "Oscar",
    "Osvaldo", "Otis", "Otto", "Owen", "Pablo", "Parker", "Pascal",
    "Paxton", "Pedro", "Percy", "Perry", "Pete", "Phil",
    "Phillip", "Pierce", "Porter", "Preston", "Prince", "Quentin", "Quincy",
    "Quinton", "Rafael", "Ramiro", "Ramon", "Randall",
    "Randolph", "Raphael", "Raul", "Ray", "Reed", "Reggie",
    "Reginald", "Reid", "Remington", "Reuben", "Rex", "Rhett",
    "Ricardo", "Rich", "Rick", "Rickey", "Ricky", "Rico", "Rob",
    "Roberto", "Rocco", "Rocky", "Rod", "Roderick", "Rodney", "Rodolfo",
    "Rodrigo", "Rogelio", "Roland", "Rolando", "Roman", "Romeo", "Ron",
    "Ronnie", "Roosevelt", "Roscoe", "Ross", "Royce",
    "Ruben", "Rudolph", "Rudy", "Rufus", "Rupert", "Russ", "Rusty", "Sal",
    "Salvador", "Salvatore", "Santiago", "Santos", "Saul", "Sawyer",
    "Sebastian", "Sergio", "Seth", "Shane", "Shaun", "Shawn", "Sheldon",
    "Sherman", "Sid", "Silas", "Simon", "Solomon", "Sonny",
    "Spencer", "Stan", "Stanley", "Stefan", "Sterling", "Steve", "Stewart",
    "Stuart", "Sylvester", "Tanner", "Tate", "Ted", "Teddy", "Terence",
    "Terrance", "Terrell", "Terrence", "Thad", "Thaddeus", "Theo",
    "Theodore", "Tim", "Titus", "Tobias", "Toby", "Todd", "Tom", "Tomas",
    "Tommy", "Tony", "Trace", "Travis", "Trent", "Trenton", "Trevor", "Trey",
    "Troy", "Truman", "Tucker", "Turner", "Ty", "Tyrone", "Tyson",
    "Ulysses", "Uriel", "Van", "Vance", "Vaughn", "Vern", "Vernon", "Victor",
    "Vince", "Virgil", "Wade", "Waldo", "Wallace", "Walt", "Ward", "Warren",
    "Waylon", "Wendell", "Wesley", "Weston", "Wilbert", "Wilbur", "Wiley",
    "Wilfred", "Will", "Willard", "Willis", "Wilson", "Winston",
    "Woodrow", "Wyatt", "Xander", "Xavier", "Zachariah", "Zack", "Zane",
    // Romance / Germanic / Nordic / Slavic
    "Alessandro", "Alejandro", "Alfonso", "Alfredo", "Aleksander", "Aleksei",
    "Anatoly", "Anders", "Andreas", "Andrei", "Angelo", "Anton", "Antonio",
    "Arjen", "Armin", "Arnaud", "Arne", "Bastian", "Benedikt",
    "Benito", "Bernardo", "Bjorn", "Bogdan", "Bruno", "Carlo",
    "Casper", "Christoph", "Claudio", "Constantin", "Cristian", "Cristiano",
    "Dag", "Damir", "Danilo", "Davide", "Dietrich", "Dimitris",
    "Dmitri", "Dmitry", "Domenico", "Eduard", "Einar", "Emanuele", "Emile",
    "Enrico", "Enrique", "Erik", "Ernst", "Etienne", "Fabio", "Fabrizio",
    "Federico", "Filip", "Filippo", "Francesco", "Franz", "Frederik",
    "Fritz", "Gabriele", "Gaetano", "Gaspard", "Georg", "Gerhard", "Gianni",
    "Giacomo", "Gianluca", "Giorgio", "Giovanni", "Giulio", "Giuseppe",
    "Gregor", "Guido", "Guillaume", "Gunnar", "Gustav", "Gustavo", "Hannes",
    "Heinrich", "Heinz", "Helmut", "Henrik", "Hermann", "Horst", "Igor", "Ilya", "Ingmar", "Ivo", "Jacques", "Jan", "Janusz",
    "Jaroslav", "Jens", "Jerzy", "Joachim", "Joao", "Johan",
    "Johann", "Johannes", "Joost", "Jos", "Josef",
    "Juergen", "Julien", "Jurgen", "Kai", "Karel", "Karsten", "Kasper",
    "Kazimierz", "Klaas", "Konstantin", "Krzysztof", "Lars", "Laurent",
    "Leif", "Lennart", "Leopold", "Lorenz", "Loris", "Luc", "Ludwig", "Luigi", "Luis", "Lukas", "Maarten", "Maksim", "Manfred",
    "Marcello", "Marek", "Marius", "Markus", "Massimo", "Mathias", "Matteo",
    "Matthias", "Maurizio", "Maxim", "Maximiliano", "Michal", "Michel",
    "Mikhail", "Milan", "Mirko", "Miroslav", "Nico", "Niklas", "Nikolai", "Nikolas", "Nils", "Norbert", "Olaf", "Oleg",
    "Olivier", "Oskar", "Paolo", "Pavel",
    "Per", "Petr", "Philippe", "Pietro", "Piotr",
    "Rainer", "Ralf", "Rasmus", "Reinhard", "Remy", "Renato",
    "Riccardo", "Rolf", "Romain", "Ruud", "Sander", "Sandro", "Sebastien", "Sergei", "Sergey", "Severin",
    "Siegfried", "Sigmund", "Silvio", "Sjoerd", "Slavko", "Soren", "Stanislav",
    "Stefano", "Stellan", "Stepan", "Sven", "Tariq", "Teodoro", "Theodor",
    "Thibault", "Thierry", "Thijs", "Thorsten", "Tomasz", "Torsten", "Udo",
    "Ulrich", "Umberto", "Uwe", "Vaclav", "Valentin", "Valentino", "Vasily",
    "Viktor", "Vincenzo", "Vitaly", "Vittorio", "Vladimir", "Vladislav",
    "Werner", "Wilhelm", "Wim", "Wolfgang", "Wouter", "Yannick", "Yaroslav", "Yuri", "Zbigniew", "Zoltan",
    // Arabic / Turkish / Persian / Hebrew
    "Abdallah", "Abdul", "Abdullah", "Adel", "Adnan", "Ahmad", "Akram",
    "Amir", "Ammar", "Anwar", "Arif", "Asad", "Ashraf", "Ayman", "Aziz",
    "Bashir", "Bilal", "Burak", "Can", "Cem", "Davut", "Emre", "Ercan",
    "Erdem", "Faisal", "Farid", "Faruk", "Fawaz", "Firas", "Ghassan",
    "Habib", "Hakan", "Hakim", "Halil", "Hamid", "Hamza", "Hasan", "Hassan",
    "Haytham", "Hossein", "Hussein", "Ibrahim", "Idris", "Imad", "Imran",
    "Ismail", "Jaber", "Jalal", "Jamil", "Kadir", "Kamal", "Karim", "Kemal",
    "Khaled", "Khalid", "Khalil", "Levent", "Mahmoud", "Majid", "Mansour", "Marwan", "Mehmet", "Mestan", "Mohamed", "Mohammad", "Morteza",
    "Mostafa", "Mourad", "Murat", "Mustafa", "Nabil", "Nadir", "Naim",
    "Nasser", "Nawaf", "Nizar", "Osman", "Qasim", "Rachid", "Rafik", "Rahim",
    "Rami", "Rashid", "Riad", "Saad", "Sabri", "Said", "Saleh", "Salem",
    "Salim", "Samir", "Selim", "Serkan", "Shadi", "Sharif", "Tahir",
    "Talal", "Tamer", "Tarek", "Volkan", "Wael", "Walid", "Yasin",
    "Yasser", "Youssef", "Yusuf", "Zahid", "Zaid", "Zakaria", "Ziad",
    "Aharon", "Avraham", "Chaim", "Eitan", "Eliezer",
    "Moshe", "Noam", "Oren", "Shimon", "Uri", "Yaakov", "Yitzhak",
    // South Asian
    "Aditya", "Ajay", "Akash", "Akhil", "Amar", "Amit", "Anand", "Anil",
    "Ankit", "Anup", "Arjun", "Arun", "Ashish", "Ashok", "Avinash", "Bala",
    "Bharat", "Chetan", "Deepak", "Dev", "Dinesh", "Ganesh", "Gaurav",
    "Girish", "Gopal", "Harish", "Hemant", "Jagdish", "Jatin", "Kapil", "Karan", "Kartik", "Krishna", "Kunal", "Lakshman",
    "Mahesh", "Manish", "Manoj", "Mohan", "Mukesh", "Naresh", "Naveen",
    "Nikhil", "Nitin", "Pankaj", "Prakash", "Pranav", "Prasad", "Praveen",
    "Rahul", "Rajeev", "Rajesh", "Rajiv", "Rakesh", "Ram", "Ramesh", "Ravi",
    "Rohan", "Rohit", "Sachin", "Sandeep", "Sanjay", "Santosh", "Shankar",
    "Sharad", "Shiva", "Siddharth", "Sunil", "Suresh", "Tarun", "Uday",
    "Umesh", "Varun", "Vijay", "Vikas", "Vikram", "Vinay", "Vinod", "Vishal",
    "Vivek", "Yash",
    // East / Southeast Asian
    "Akira", "Daiki", "Daisuke", "Haruto", "Hideo", "Hideki", "Hiro",
    "Ichiro", "Isamu", "Jiro", "Katsu", "Kazuki", "Kazuo", "Keiji", "Kenji",
    "Kenta", "Koji", "Masahiro", "Masaru", "Noboru", "Osamu",
    "Riku", "Ryo", "Ryota", "Satoshi", "Shigeru", "Shinji", "Sho",
    "Shota", "Sota", "Susumu", "Tadashi", "Takahiro", "Takashi", "Takeshi",
    "Takumi", "Taro", "Tatsuya", "Tetsuya", "Toru", "Toshio", "Yamato",
    "Yasuo", "Yoshio", "Yuji", "Yuta", "Yutaka",
    "Chen", "Cheng", "Feng", "Guang", "Hao", "Jian", "Liang", "Ming", "Peng", "Qiang", "Tao", "Xiang", "Yong", "Zhen",
    "Zhong",
    "Dong", "Ho", "Hyun", "Jae", "Joon", "Minho", "Seung", "Sung",
    "Duc", "Hieu", "Hung", "Khoa", "Long", "Minh", "Nam", "Phuc",
    "Quan", "Tuan",
    // African
    "Abebe", "Addis", "Amadou", "Chidi", "Chinedu", "Emeka",
    "Femi", "Ibrahima", "Kofi", "Kwame", "Mamadou", "Obi", "Olu", "Oumar",
    "Sekou", "Thabo", "Tunde")

  private val extFemale = Seq(
    // US/English staples beyond the core top-100
    "Abby", "Ada", "Adalyn", "Adele", "Adeline", "Adriana",
    "Adrienne", "Agatha", "Agnes", "Aileen", "Aimee", "Alana", "Alannah",
    "Alberta", "Alejandra", "Alexa", "Alexandra", "Alexandria", "Alicia", "Alina", "Alisha", "Alison", "Alissa", "Allison", "Allyson",
    "Alma", "Alyssa", "Amalia", "Amaya", "Amelia", "Amie",
    "Amira", "Anastasia", "Andria", "Angelica", "Angelina",
    "Angeline", "Angie", "Anika", "Anita", "Anne", "Annette", "Annie",
    "Annika", "Antoinette", "April", "Arabella", "Araceli", "Ariana",
    "Arianna", "Ariel", "Arlene", "Astrid", "Athena", "Audra",
    "Audrey", "Aurora", "Autumn", "Ava", "Barbra",
    "Beatrice", "Beatriz", "Becky", "Belinda", "Bella", "Bernadette",
    "Bernice", "Bertha", "Bess", "Bessie", "Beth", "Bethany", "Betsy",
    "Bette", "Bettie", "Beulah", "Bianca", "Blanca",
    "Blanche", "Bonnie", "Brandi", "Brandy", "Breanna", "Bree",
    "Brenna", "Bria", "Briana", "Brianna", "Bridget", "Bridgette", "Brielle",
    "Brigitte", "Brittney", "Brooke", "Brooklyn", "Brynn", "Caitlin",
    "Caitlyn", "Callie", "Camila", "Camille", "Candace", "Candice", "Candy",
    "Cara", "Carina", "Carissa", "Carla", "Carlene", "Carly", "Carmela",
    "Carole", "Carolina", "Caroline", "Carrie",
    "Cassandra", "Cassie", "Catalina", "Cathy", "Cecelia",
    "Cecilia", "Celeste", "Celia", "Celine", "Chandra", "Chanel", "Charity",
    "Charlene", "Chasity", "Chelsea", "Chelsey", "Cherie", "Cherry",
    "Chloe", "Christa", "Christie", "Christy", "Cindy", "Claire", "Clara",
    "Clarissa", "Claudette", "Claudia", "Colette", "Colleen",
    "Connie", "Constance", "Cora", "Coral", "Corinne", "Cornelia", "Corrine",
    "Cristina", "Crystal", "Daisy", "Damaris", "Daniela", "Daniella", "Daphne", "Darla", "Darlene", "Dawn",
    "Deanna", "Debbie", "Deirdre", "Delia", "Delilah",
    "Della", "Delores", "Dena", "Desiree", "Destiny", "Dianna", "Dianne", "Dina", "Dixie", "Dolly", "Dolores", "Dora", "Doreen", "Dorothea", "Dottie", "Edith",
    "Edna", "Eileen", "Elaine", "Eleanor", "Eliana", "Elisa",
    "Elisabeth", "Elise", "Eliza", "Ella", "Elle", "Ellen", "Ellie",
    "Eloise", "Elsa", "Elsie", "Elvira", "Emilia", "Emilie", "Emmeline",
    "Enid", "Erica", "Erika", "Erin", "Esmeralda", "Esperanza", "Essie",
    "Estelle", "Esther", "Ethel", "Eudora", "Eugenia", "Eula", "Eunice",
    "Eva", "Evangeline", "Eve", "Evelina", "Faith", "Fannie", "Fay", "Faye",
    "Felicia", "Felicity", "Fern", "Fernanda", "Fiona", "Flora", "Florence",
    "Francesca", "Francine", "Freda", "Frieda", "Gabriela",
    "Gabriella", "Gabrielle", "Gail", "Gemma", "Gena", "Geneva",
    "Genevieve", "Georgia", "Georgina", "Geraldine", "Gertrude", "Gia",
    "Gilda", "Gina", "Ginger", "Ginny", "Giselle", "Gladys", "Glenda",
    "Glenna", "Goldie", "Greta", "Gretchen", "Gwen",
    "Gwendolyn", "Hailey", "Haley", "Hallie", "Harmony", "Harriet",
    "Hattie", "Haven", "Hazel", "Heidi", "Helena", "Helene",
    "Henrietta", "Hilda", "Hillary", "Holly", "Hope", "Ida",
    "Iliana", "Imelda", "Imogene", "India", "Ines", "Irene", "Iris", "Irma",
    "Isabel", "Isabelle", "Isadora", "Ivy", "Jada", "Jade",
    "Jana", "Jane", "Janelle", "Janette", "Janie", "Janine", "Jasmin", "Jasmine", "Jayla", "Jeanette", "Jeanie", "Jeanne",
    "Jeannette", "Jeannie", "Jenifer", "Jenna", "Jennie", "Jenny", "Jewel", "Jill", "Jillian", "Joanna", "Joanne",
    "Jocelyn", "Jodi", "Johanna", "Joleen", "Jolene", "Joni",
    "Josefina", "Josephine", "Josie", "Joy", "Juana", "Juanita",
    "Judi", "Juliana", "Julianna", "Julianne", "Juliet", "Juliette", "June",
    "Justine", "Kaitlin", "Kaitlyn", "Kala", "Kara", "Karin", "Karina",
    "Karla", "Kasey", "Kate", "Katelyn", "Kathie", "Kathy", "Katie",
    "Katrina", "Katy", "Kay", "Kaye", "Kayleigh", "Keisha", "Kendra",
    "Keri", "Kerri", "Kiara", "Kiera", "Kimberlee", "Kimberley",
    "Kira", "Kirsten", "Kitty", "Kristen", "Kristi", "Kristie", "Kristin",
    "Kristina", "Kristine", "Kristy", "Krystal", "Kyla", "Kylie", "Lacey",
    "Laila", "Lana", "Laney", "Lara", "Larissa", "Latasha", "Latoya",
    "Laurel", "Lauri", "Laurie", "Lavinia", "Leah", "Leanna",
    "Leanne", "Leila", "Lela", "Lena", "Lenora", "Leona", "Leonor", "Leticia", "Letitia", "Lexi", "Lila", "Lilian", "Liliana", "Lillian",
    "Lillie", "Lily", "Lina", "Liza", "Lizzie",
    "Lois", "Lola", "Lorena", "Loretta", "Lori", "Lorna", "Lorraine",
    "Lottie", "Louella", "Louisa", "Louise", "Luann", "Lucille",
    "Lucinda", "Lucy", "Luella", "Luisa", "Lula", "Luna", "Luz",
    "Lydia", "Lyn", "Lynda", "Lynette", "Lynne", "Mabel", "Macy",
    "Madeleine", "Madeline", "Madelyn", "Madge", "Mae", "Maggie", "Maia",
    "Mallory", "Mamie", "Mandy", "Mara", "Marcella", "Marci", "Marcia",
    "Margarita", "Margie", "Margo", "Margot", "Marguerite", "Mariah",
    "Mariana", "Marianne", "Maribel", "Maricela", "Marina",
    "Marisa", "Marisol", "Marissa", "Marjorie", "Marla", "Marlene",
    "Marta", "Maryann", "Maryanne", "Matilda", "Mattie", "Maude", "Maura",
    "Maureen", "Mavis", "Maxine", "May", "Maya", "Meagan",
    "Meg", "Melanie", "Melba", "Melinda", "Melody", "Mercedes", "Mia", "Michaela", "Michele", "Mikayla", "Mildred", "Millicent",
    "Millie", "Mindy", "Minerva", "Minnie", "Mira", "Miranda", "Miriam",
    "Missy", "Misty", "Mitzi", "Mollie", "Molly", "Mona", "Monica",
    "Monique", "Muriel", "Myra", "Myrna", "Myrtle", "Nadia", "Nadine",
    "Nanette", "Naomi", "Natalia", "Natasha", "Nellie", "Nettie",
    "Nichole", "Nikki", "Nina", "Nita", "Noelle", "Nola", "Nona", "Nora",
    "Noreen", "Norma", "Nova", "Nydia", "Odessa", "Ofelia", "Ola", "Olga",
    "Olive", "Opal", "Ophelia", "Paige", "Pam", "Pansy", "Paola", "Patrice",
    "Patsy", "Patti", "Patty", "Paula", "Paulette", "Pauline", "Pearl",
    "Peggy", "Penelope", "Penny", "Petra", "Phoebe", "Phyllis", "Piper",
    "Polly", "Precious", "Priscilla", "Prudence", "Queen", "Rachael",
    "Rachelle", "Ramona", "Raquel", "Reba", "Rebekah", "Regina",
    "Renata", "Renee", "Rhea", "Rhoda", "Rhonda", "Rita", "Roberta",
    "Robyn", "Rochelle", "Ronda", "Rosa", "Rosalie", "Rosalind", "Rosalinda",
    "Rosanna", "Rosanne", "Rosemarie", "Rosemary", "Rosie", "Roslyn",
    "Rowena", "Roxanne", "Ruby", "Ruthie", "Sabrina", "Sadie", "Sally",
    "Salma", "Sasha", "Saundra", "Savannah", "Scarlett", "Selena",
    "Selma", "Serena", "Shana", "Shania", "Shanna", "Shari", "Sharla",
    "Shawna", "Sheena", "Sheila", "Shelia", "Shelley",
    "Shelly", "Sheri", "Sherri", "Sherrie", "Sherry", "Sheryl", "Shira",
    "Sierra", "Silvia", "Simone", "Sloane", "Sondra", "Sonia", "Sonja",
    "Sonya", "Staci", "Stacie", "Star", "Stella",
    "Stephany", "Sue", "Summer", "Susana", "Susanna", "Susannah", "Susanne",
    "Susie", "Suzanne", "Suzette", "Sybil", "Sylvia", "Tabitha",
    "Tamara", "Tami", "Tamika", "Tammie", "Tammy", "Tania", "Tanya", "Tara",
    "Tasha", "Tatiana", "Tawny", "Teri", "Terri", "Tessa", "Thea",
    "Thelma", "Tia", "Tiffany", "Tina", "Tonya", "Tori", "Traci", "Tricia", "Trina", "Trisha", "Trudy", "Twila", "Ursula",
    "Valarie", "Valencia", "Valerie", "Vanessa", "Velma", "Vera", "Verna",
    "Veronica", "Vicki", "Vickie", "Vicky", "Viola", "Violet", "Vivian",
    "Viviana", "Vivienne", "Wanda", "Wendy", "Wilda",
    "Wilhelmina", "Willa", "Wilma", "Winifred", "Winnie", "Yesenia",
    "Yolanda", "Yvette", "Yvonne", "Zelda", "Zoe", "Zora",
    // Romance / Germanic / Nordic / Slavic
    "Agnieszka", "Aleksandra", "Alessandra", "Alenka", "Anette", "Angelika", "Anja", "Anka", "Annalisa", "Annemarie", "Antonella", "Antonia", "Beata", "Beate", "Benedetta",
    "Birgit", "Bozena", "Brigitta", "Camilla", "Carlotta",
    "Caterina", "Christiane", "Claudine", "Concetta", "Cosima",
    "Danuta", "Daria", "Dagmar", "Dorota", "Dorothee", "Edda",
    "Elif", "Elisabetta", "Elke", "Emanuela", "Emmanuelle",
    "Ester", "Ewa", "Federica", "Franziska", "Frida", "Galina", "Gerda",
    "Giada", "Gisela", "Giulia", "Giuseppina", "Grazyna", "Gudrun",
    "Halina", "Hanna", "Hannelore", "Heike", "Helga", "Henriette", "Ilaria",
    "Ilona", "Ilse", "Inga", "Inge", "Ingeborg", "Irena",
    "Irina", "Iryna", "Iwona", "Jadwiga", "Janina", "Jarmila",
    "Jelena", "Jolanta", "Juliane", "Katarina",
    "Katarzyna", "Katerina", "Katharina", "Kathrin", "Katja", "Kerstin",
    "Klara", "Krystyna", "Ksenia", "Larisa", "Lidia", "Liesel", "Lilia", "Liliane", "Lillemor", "Linnea", "Lisbeth",
    "Ljubica", "Ludmila", "Lydie", "Magda", "Magdalena",
    "Maja", "Malgorzata", "Manuela", "Margareta", "Margarete",
    "Margherita", "Margit", "Marianna", "Marietta", "Marika",
    "Marion", "Marita", "Mariya", "Marlies", "Martina",
    "Maryam", "Matilde", "Mechthild", "Milena", "Mirjam", "Mirella",
    "Miroslava", "Monika", "Natalya", "Nadezhda", "Nadja", "Natasa",
    "Nicoletta", "Oksana", "Olena", "Ornella", "Paulina",
    "Pilar", "Raffaella", "Rebekka", "Renate", "Romana", "Rosalia", "Rosaria", "Rossana", "Roswitha", "Ruza", "Sabine",
    "Sieglinde", "Sigrid", "Silke", "Simona",
    "Smilla", "Snezana", "Solveig", "Stefania", "Svetlana",
    "Sylvie", "Tatjana", "Teodora", "Tiziana", "Tove",
    "Ulla", "Ulrike", "Ute", "Valentina", "Valeria", "Vanda",
    "Vasilisa", "Veronika", "Vesna", "Viktoria", "Violeta",
    "Vittoria", "Waltraud", "Wislawa", "Yana", "Yulia", "Zdenka",
    "Zofia", "Zuzana",
    // Arabic / Turkish / Persian / Hebrew
    "Aaliyah", "Abeer", "Aida", "Aliya", "Aliyah", "Amal",
    "Amani", "Amina", "Arwa", "Asma", "Ayse", "Azra", "Basma",
    "Bushra", "Dalia", "Derya", "Dilara", "Esra", "Farah",
    "Farida", "Fatma", "Fadia", "Ghada", "Gul", "Hala", "Halima", "Hana",
    "Hanan", "Havva", "Hayat", "Hessa", "Hind", "Huda", "Iman",
    "Jamila", "Kadriye", "Kamila", "Karima", "Khadija", "Lamia",
    "Latifa", "Layla", "Leyla", "Lubna", "Maha", "Mariam", "Marwa",
    "Maysa", "Melek", "Meryem", "Muna", "Nada", "Nahla", "Naima", "Najla", "Nawal", "Nesrin", "Nour", "Nura", "Rabia",
    "Rahma", "Rana", "Rania", "Rasha", "Reem", "Rima", "Ruqayya", "Sabah",
    "Safa", "Sahar", "Salwa", "Samah", "Samar", "Samira", "Sana", "Selin",
    "Sevgi", "Shaima", "Soraya", "Suad", "Sumaya", "Thana",
    "Wafa", "Warda", "Yasmin", "Yasmine", "Zahra", "Zeynep", "Zainab",
    "Zubaida",
    "Avital", "Batya", "Chana", "Devorah", "Hadassah", "Ilana",
    "Noa", "Rivka", "Tamar", "Yael",
    // South Asian
    "Aarti", "Aditi", "Aishwarya", "Amrita", "Ananya", "Anjali",
    "Ankita", "Anu", "Anusha", "Aparna", "Archana", "Asha", "Bhavna",
    "Chandni", "Deepa", "Deepika", "Divya", "Gauri", "Gayatri", "Geeta",
    "Hema", "Indira", "Ishita", "Jaya", "Jyoti", "Kajal", "Kalpana",
    "Kamala", "Kavita", "Kavya", "Kiran", "Lakshmi", "Lata", "Madhuri",
    "Mala", "Manisha", "Meena", "Meera", "Megha", "Mohini", "Namrata", "Nandini", "Neha", "Nisha", "Padma", "Pallavi",
    "Parvati", "Pooja", "Prachi", "Preeti", "Priyanka", "Rachna", "Radha",
    "Rani", "Rashmi", "Rekha", "Renu", "Richa", "Ritu", "Roshni", "Rupa",
    "Sangeeta", "Sarika", "Savita", "Seema", "Shalini", "Shanti", "Sharda",
    "Shilpa", "Shobha", "Shreya", "Shweta", "Smita", "Sneha", "Sonali",
    "Sudha", "Sujata", "Suman", "Sunita", "Supriya", "Sushma",
    "Swati", "Tanvi", "Uma", "Usha", "Vandana", "Vani", "Varsha", "Vidya",
    "Yamini",
    // East / Southeast Asian
    "Aiko", "Akemi", "Akiko", "Asuka", "Aya", "Ayaka", "Ayumi", "Chie",
    "Chiyo", "Emi", "Eri", "Etsuko", "Fumiko", "Hanako", "Haruka",
    "Haruko", "Hikari", "Hiroko", "Hitomi", "Honoka", "Junko",
    "Kanako", "Kaori", "Kasumi", "Kazuko", "Keiko", "Kiko", "Kimiko",
    "Kiyoko", "Kumiko", "Kyoko", "Mai", "Maki", "Mami", "Mariko", "Masako",
    "Mayumi", "Megumi", "Michiko", "Midori", "Mika", "Miki", "Misaki",
    "Mitsuko", "Miyuki", "Momoko", "Nanami", "Naoko", "Natsumi", "Noriko", "Reiko", "Rie", "Rika", "Rin", "Rina", "Ruriko",
    "Ryoko", "Sachiko", "Saki", "Sakura", "Satomi", "Sayaka", "Setsuko",
    "Shiori", "Sumiko", "Takako", "Tamiko", "Tomoko", "Toshiko", "Yoko",
    "Yoshiko", "Yui", "Yuka", "Yukiko", "Yumi", "Yumiko", "Yuriko",
    "Fang", "Hua", "Hui", "Lan", "Lihua", "Ling", "Meiling", "Na", "Qing", "Ting", "Xia", "Xiao", "Xiu",
    "Ying", "Yue", "Eun", "Hye", "Jiyeon", "Mi", "Minji", "Seo", "Soo", "Yeon",
    "Anh", "Hoa", "Huong", "Lien", "Ngoc", "Nguyet", "Thao", "Thuy",
    "Trang",
    // African
    "Abena", "Adaeze", "Adanna", "Afia", "Aissatou", "Akosua", "Ama",
    "Amara", "Aminata", "Ayesha", "Chiamaka", "Chioma", "Efua", "Esi",
    "Fanta", "Fatou", "Folake", "Ifeoma", "Kadiatou", "Mariama",
    "Ngozi", "Nneka", "Nnenna", "Ramatoulaye", "Yaa", "Zuri")

  private val extMostlyMale = Seq(
    "Bailey", "Blair", "Cameron",
    "Carey", "Carroll", "Emery", "Finley", "Frankie", "Gerry", "Hayden",
    "Hollis", "Jackie", "Jessie", "Jody", "Jules", "Kerry", "Kris", "Lane", "Lavern", "Loren", "Merle", "Nicky", "Ollie", "Phoenix",
    "Rory", "Sami", "Sandy", "Stevie")

  private val extMostlyFemale = Seq(
    "Addison", "Aubrey", "Billie", "Bobbie", "Brook", "Carmen", "Cassidy",
    "Clare", "Dee", "Dominique", "Eden", "Gayle", "Guadalupe", "Harper", "Hilary", "Jo", "Kelsey", "Kendall", "Kenya",
    "Laverne", "Leigh", "Lindsay", "Lindsey", "Lupe",
    "Lynn", "Mackenzie", "Meredith", "Paris",
    "Reese", "Sage", "Shelby", "Sidney", "Stacey",
    "Stacy", "Sydney", "Tracy")

  private val extAndy = Seq(
    "Alva", "Amari", "Arden", "Armani", "Azariah", "Baby",
    "Bellamy", "Blessing", "Bowie", "Campbell", "Charley", "Denver", "Devan", "Ellery", "Emory", "Gentry", "Indiana", "Jaylin", "Justice", "Kamari", "Lake", "Landry", "Lennon", "Lennox",
    "Marlowe", "Merritt", "Monroe", "Murphy", "Oakley", "Ocean",
    "Onyx", "Peyton", "Rebel", "Ridley",
    "River", "Robbie", "Rowan", "Royal", "Santana", "Scout", "Shay", "Shiloh", "Sky", "Storm", "Sutton", "Tatum", "Tenzin", "Toni", "Tory",
    "Unique", "Winter", "Wren", "Zephyr")

  // ------------------------------------------------------------------
  // I18N tier (round-6 VERDICT item 7): native diacritic given names,
  // composed (NFC) in source — the same way gender_guesser's nam_dict
  // carries "José" as its own entry rather than accent-stripping inputs.
  // ------------------------------------------------------------------

  private val diacriticMale = Seq(
    "José", "André", "Andrés", "François", "Jürgen", "Björn", "Søren",
    "Günter", "Ángel", "Óscar", "Seán", "Raúl", "Ramón", "Jesús", "Matías",
    "Nicolás", "Sebastián", "Iván", "Péter", "János", "Jiří", "Miloš",
    "Stéphane", "Frédéric", "Jérôme", "Gaël", "Gérard", "Cándido", "Tomás",
    "Víctor", "Rubén", "Łukasz", "Paweł", "Michał", "Jörg",
    "Sören", "Måns", "Kåre", "Ørjan", "Þór2", "Émile")

  private val diacriticFemale = Seq(
    "María", "Inés", "Renée", "Zoë", "Chloé", "Céline", "Agnès", "Sofía",
    "Lucía", "Verónica", "Mónica", "Ángela", "Françoise", "Amélie",
    "Éloïse", "Noémie", "Anaïs", "Zsófia", "Katarína", "Åsa", "Linnéa",
    "Desirée", "Bárbara", "Begoña", "Rocío", "Señora2", "Penélope",
    "Valérie", "Hélène", "Aurélie", "Gréta", "Dorothée", "Łucja", "Käthe", "Grüne2", "Özlem", "Gül", "Nazlı", "İrem")

  private val diacriticMostlyMale = Seq("René") // mirrors core "Rene"

  // ------------------------------------------------------------------
  // Round-7 breadth: top names per major locale from public census-style
  // lists (India, China/pinyin, Japan/romaji, Korea, the Arab world,
  // Türkiye, Russia/Slavic, Vietnam, Indonesia, West/South/East Africa,
  // Israel, Scandinavia/NL/DE) — romanized forms first, then NATIVE
  // NON-LATIN SCRIPT entries (Cyrillic, Greek, Arabic, Devanagari,
  // Hangul, Hebrew) so un-transliterated profiles resolve instead of
  // degrading to `unknown`. Unisex-leaning names land in mostly_*/andy
  // rather than guessing; Han-character given names stay ABSENT by
  // design (a single hanzi rarely determines gender — documented
  // transliteration-or-unknown, pinned in GenderSpec). Suffix digits
  // dedupe repeats of core spellings as elsewhere.
  // ------------------------------------------------------------------

  private val localeMale = Seq(
    // India (romanized)
    "Aarav", "Arjun", "Rohan", "Rahul", "Amit", "Sanjay", "Vijay", "Anil",
    "Sunil", "Rajesh", "Suresh", "Ramesh", "Deepak", "Manish", "Ankit",
    "Nikhil", "Karan", "Varun", "Aditya", "Abhishek", "Siddharth", "Ashok",
    "Vikram", "Gaurav", "Pranav", "Ishaan", "Kabir", "Aryan", "Ganesh",
    "Prakash", "Dinesh", "Mahesh", "Naveen", "Sachin", "Vivek", "Ajay",
    "Harish", "Mohan", "Ravi", "Sandeep", "Tarun", "Uday", "Yash",
    // China (pinyin, clearly-gendered picks only)
    "Qiang", "Gang", "Feng", "Lei", "Cheng", "Peng", "Bin", "Dong", "Liang",
    "Yong", "Zhiqiang", "Jianguo", "Weiming",
    // Japan (romaji)
    "Haruto", "Sota", "Yuto", "Riku", "Daiki", "Takumi", "Kenji", "Takashi",
    "Kazuki", "Taro", "Ichiro", "Jiro", "Satoshi", "Naoki", "Shinji",
    "Kenta", "Daisuke", "Yusuke", "Shota", "Kaito", "Sho", "Kenichi",
    "Masashi", "Tetsuya", "Ryota", "Yuya", "Koji", "Osamu", "Susumu",
    // Korea (romanized)
    "Minjun", "Seojun", "Dohyun", "Jihun", "Minho", "Sungmin", "Joon",
    "Taeyang", "Hyunwoo", "Jinwoo",
    // Arab world
    "Hassan", "Hussein", "Ibrahim", "Khalid", "Tariq", "Yusuf", "Mustafa",
    "Mahmoud", "Karim", "Samir", "Nabil", "Rashid", "Faisal", "Hamza",
    "Bilal", "Zaid", "Amir", "Adel", "Fahad", "Saeed", "Waleed", "Ziad",
    "Osman", "Salim", "Anwar", "Imran", "Kamal", "Nasser", "Tarek", "Ayman",
    "Bassam", "Fadi", "Ghassan", "Hakim", "Jawad", "Abdullah", "Abdul",
    "Hamid", "Jamil", "Mansour", "Qasim", "Sultan", "Walid", "Yahya",
    // Türkiye
    "Mehmet", "Ahmet", "Emre", "Burak", "Murat", "Kemal", "Ozan", "Serkan",
    "Volkan", "Baran", "Cem", "Arda", "Kaan", "Onur", "Tolga", "Baris",
    "Hakan", "Erdem", "Selim", "Yavuz",
    // Russia / Slavic (romanized)
    "Dmitri", "Dmitry", "Sergei", "Sergey", "Andrei", "Andrey", "Alexei",
    "Alexey", "Mikhail", "Nikolai", "Vladimir", "Oleg", "Igor", "Yuri",
    "Viktor", "Vasily", "Pavel", "Anton", "Artem", "Maxim", "Roman",
    "Ruslan", "Stanislav", "Vitaly", "Gennady", "Anatoly", "Leonid",
    "Konstantin", "Grigory", "Bogdan", "Miroslav", "Zoran", "Dragan",
    "Marko", "Stefan", "Vuk", "Dusan", "Tomasz", "Piotr", "Krzysztof",
    "Andrzej", "Marek", "Grzegorz", "Wojciech", "Jakub", "Mateusz",
    "Szymon", "Kamil", "Rafal", "Zbigniew", "Jerzy", "Tadeusz", "Vaclav",
    "Petr", "Ondrej", "Matej",
    // Vietnam
    "Duc", "Hung", "Tuan", "Quang", "Nam", "Hieu", "Phuc", "Dat", "Huy",
    "Trung", "Vinh",
    // Indonesia / Malaysia
    "Budi", "Agus", "Bambang", "Dedi", "Eko", "Hadi", "Joko", "Slamet",
    "Wawan", "Yanto", "Adi", "Rudi",
    // Africa
    "Kwame", "Kofi", "Emeka", "Chinedu", "Obinna", "Ikenna", "Nnamdi",
    "Olusegun", "Adebayo", "Babatunde", "Tunde", "Femi", "Sipho", "Thabo",
    "Mandla", "Abebe", "Tesfaye", "Girma", "Mamadou", "Ousmane", "Ibrahima",
    "Moussa", "Amadou", "Sekou", "Cheikh", "Demba",
    // Israel
    "Moshe", "Avraham", "Yitzhak", "Yaakov", "Shlomo", "Chaim", "Eitan",
    "Uri", "Gilad", "Yonatan", "Oren", "Barak", "Yossi", "Ehud", "Zvi",
    // Scandinavia / NL / DE beyond the core
    "Lars", "Sven", "Bjorn", "Erik", "Gunnar", "Magnus", "Olaf", "Anders",
    "Nils", "Per", "Henrik", "Mats", "Thor", "Einar", "Leif", "Knut",
    "Jesper", "Mikkel", "Rasmus", "Soren", "Kasper", "Frederik", "Wouter",
    "Jeroen", "Sjoerd", "Gijs", "Bram", "Daan", "Sem", "Thijs", "Florian",
    "Tobias", "Matthias", "Moritz", "Till", "Henning",
    "Detlef", "Uwe", "Rainer", "Wolfgang", "Helmut", "Dieter", "Horst")

  private val localeFemale = Seq(
    // India (romanized)
    "Aishwarya", "Ananya", "Divya", "Kavya", "Pooja", "Priyanka", "Neha",
    "Sneha", "Shreya", "Anjali", "Deepika", "Lakshmi", "Sita", "Radha",
    "Meera", "Sunita", "Kavita", "Savita", "Rekha", "Asha", "Usha", "Geeta",
    "Seema", "Ritu", "Swati", "Nisha", "Isha", "Riya", "Diya", "Aanya",
    "Saanvi", "Ishita", "Tanvi", "Pallavi", "Shweta", "Vidya", "Madhuri",
    // China (pinyin)
    "Xiu", "Lan", "Ying", "Fang", "Xia", "Qing", "Lili", "Meiling", "Xiaoli",
    "Xiaomei", "Huifang", "Yanfang",
    // Japan (romaji)
    "Sakura", "Yui", "Hina", "Mio", "Koharu", "Ichika", "Himari", "Hana",
    "Akari", "Ayumi", "Naoko", "Keiko", "Yoko", "Emi", "Mariko", "Sachiko",
    "Tomoko", "Yumi", "Kana", "Aya", "Miki", "Nana", "Airi", "Misaki",
    "Kaori", "Megumi", "Chie", "Eri", "Kumiko", "Noriko", "Michiko",
    "Yukiko", "Hiroko", "Kyoko", "Rie", "Mayumi",
    // Korea (romanized)
    "Seoyeon", "Minseo", "Hayoon", "Jiyoon", "Eunji", "Soyeon", "Yuna",
    "Sooyoung", "Hyejin", "Minji", "Eunae", "Haeun",
    // Arab world
    "Layla", "Leila", "Zainab", "Mariam", "Maryam", "Huda", "Salma",
    "Rania", "Dalia", "Yasmin", "Yasmine", "Hanan", "Samira", "Nadia",
    "Farida", "Karima", "Latifa", "Najwa", "Rasha", "Reem", "Sana", "Suha",
    "Zahra", "Khadija", "Fatimah", "Aminah", "Safiya", "Hafsa", "Asma",
    "Bushra", "Ghada", "Hala", "Jamila", "Lubna", "Mona", "Sahar", "Wafa",
    "Amira", "Habiba", "Nawal", "Soraya",
    // Türkiye
    "Elif", "Zeynep", "Ayse", "Emine", "Hatice", "Meryem", "Esra", "Merve",
    "Busra", "Seda", "Gamze", "Tugba", "Sibel", "Pinar", "Aylin", "Cansu",
    "Dilara", "Ebru", "Fulya", "Gizem", "Hande", "Irem", "Kubra", "Melis",
    "Nilufer", "Ozge", "Selin", "Tuba", "Yasemin", "Ceren",
    // Russia / Slavic (romanized)
    "Olga", "Irina", "Svetlana", "Natalia", "Natasha", "Tatiana",
    "Ekaterina", "Anastasia", "Oksana", "Galina", "Lyudmila", "Valentina",
    "Yulia", "Alina", "Polina", "Ksenia", "Daria", "Darya", "Vera",
    "Nadezhda", "Larisa", "Raisa", "Zinaida", "Milena", "Ivana", "Jelena",
    "Dragana", "Snezana", "Agnieszka", "Malgorzata", "Katarzyna", "Joanna",
    "Magdalena", "Ewa", "Zofia", "Hanna", "Alicja", "Beata", "Dorota",
    "Edyta", "Halina", "Iwona", "Jolanta", "Renata", "Urszula", "Wanda",
    "Zuzanna", "Tereza", "Lenka", "Marketa", "Petra", "Veronika", "Adela",
    // Vietnam
    "Huong", "Hoa", "Trang", "Thuy", "Nga", "Hanh", "Yen", "Thi",
    // Africa
    "Ama", "Akosua", "Abena", "Ngozi", "Chioma", "Adaeze", "Nneka", "Amara",
    "Chiamaka", "Folake", "Yetunde", "Bisi", "Funmilayo", "Zanele",
    "Thandiwe", "Nomvula", "Aminata", "Fatoumata", "Mariama", "Awa",
    "Khady", "Bintou",
    // Israel
    "Rivka", "Leah", "Miriam", "Tamar", "Noa", "Yael", "Michal", "Shira",
    "Talia", "Avital", "Hadas", "Orit", "Ronit", "Dafna", "Galit", "Liat",
    "Sigal",
    // Scandinavia / NL / DE beyond the core
    "Astrid", "Sigrid", "Solveig", "Maja", "Freja", "Saga", "Tuva", "Elin",
    "Malin", "Hedda", "Thea", "Femke", "Sanne", "Lotte", "Anouk",
    "Marit", "Heike", "Ute", "Gudrun", "Hildegard", "Renate", "Sabine",
    "Silke", "Antje", "Birgit", "Dagmar", "Elke", "Gisela", "Hannelore")

  private val localeMostlyMale = Seq(
    "Krishna", "Akira", "Ryo", "Minh", "Noam", "Doron", "Nikola", "Rune",
    "Jun", "Levent", "Sami")

  private val localeMostlyFemale = Seq(
    "Rin", "Haruka", "Noor", "Amal", "Linh", "Thao", "Maya", "Mai",
    "Iman")

  private val localeAndy = Seq(
    "Jie", "Xin", "Yan", "Hong", "Jing", "Hui", "Aoi", "Rei", "Makoto",
    "Jisoo", "Jiwoo", "Jimin", "Deniz", "Thanh", "Khanh", "Ngoc", "Phuong",
    "Tal", "Lior", "Shai", "Kagiso", "Oluwaseun", "Sai", "Kiran")

  // Native non-Latin script entries — exact NFC keys, no folding applies.
  private val scriptMale = Seq(
    // Cyrillic
    "Александр", "Дмитрий", "Сергей", "Андрей", "Алексей", "Михаил",
    "Иван", "Владимир", "Николай", "Пётр", "Юрий", "Олег", "Игорь",
    "Павел", "Антон", "Максим", "Роман", "Виктор",
    // Greek
    "Γιώργος", "Δημήτρης", "Νίκος", "Κώστας", "Γιάννης", "Παναγιώτης",
    "Βασίλης", "Χρήστος", "Σπύρος",
    // Arabic script
    "محمد", "أحمد", "علي", "عمر", "حسن", "حسين", "خالد", "يوسف",
    "إبراهيم", "عبدالله",
    // Devanagari
    "राहुल", "अमित", "रोहन", "विजय", "संजय", "अर्जुन", "राजेश", "सुरेश",
    // Hangul
    "민준", "서준", "도윤", "지후",
    // Hebrew script
    "משה", "דוד", "אברהם", "יוסף")

  private val scriptFemale = Seq(
    // Cyrillic
    "Мария", "Ольга", "Елена", "Наталья", "Ирина", "Светлана", "Татьяна",
    "Екатерина", "Анастасия", "Анна", "Юлия", "Вера", "Надежда",
    "Людмила", "Александра",
    // Greek
    "Μαρία", "Ελένη", "Κατερίνα", "Σοφία", "Δήμητρα", "Αγγελική",
    "Βασιλική",
    // Arabic script
    "فاطمة", "عائشة", "مريم", "زينب", "خديجة", "ليلى", "سارة", "هدى",
    "سلمى",
    // Devanagari
    "प्रिया", "पूजा", "नेहा", "अंजलि", "काव्या", "दिव्या", "सीता", "गीता",
    // Hangul
    "서연", "하윤", "서현", "지유",
    // Hebrew script
    "שרה", "רבקה", "רחל", "מרים", "נועה", "יעל")

  // Round-8 breadth tranche (public census-style given-name lists):
  // Romance-language Europe + Latin America, Greece, Iran,
  // Pakistan/Bangladesh, the Philippines, Thailand, Slavic/Nordic
  // female names, plus a small deliberately-categorized ambiguous set.
  // Appended LAST in orderedAll, so earlier core entries win conflicts
  // (duplicates here are harmless by construction — first category
  // wins, no suffix hacks).
  private val tranche8Male = Seq(
    // Italy
    "Alessandro", "Lorenzo", "Matteo", "Leonardo", "Davide", "Riccardo",
    "Tommaso", "Edoardo", "Giulio", "Salvatore", "Vincenzo", "Giuseppe",
    "Paolo", "Federico", "Massimo", "Stefano", "Fabio", "Dario", "Enrico",
    "Claudio", "Emanuele", "Gianluca", "Maurizio", "Sandro", "Franco",
    // France
    "Antoine", "Baptiste", "Clement", "Damien", "Etienne", "Fabien",
    "Gaspard", "Hugo", "Julien", "Laurent", "Mathieu", "Olivier", "Pascal",
    "Quentin", "Romain", "Sebastien", "Thierry", "Valentin", "Xavier",
    "Yannick", "Alain", "Bernard", "Christophe", "Didier", "Francois",
    "Gerard", "Herve", "Jacques", "Luc", "Marcel", "Philippe", "Remi",
    "Thibault", "Armand", "Edouard",
    // Spain / Latin America
    "Alejandro", "Andres", "Cristian", "Eduardo", "Emilio", "Esteban",
    "Felipe", "Fernando", "Gonzalo", "Guillermo", "Ignacio", "Jorge",
    "Leandro", "Manuel", "Marcos", "Mariano", "Mateo", "Mauricio",
    "Nicolas", "Pablo", "Pedro", "Rafael", "Ramon", "Raul", "Ricardo",
    "Roberto", "Rodrigo", "Santiago", "Sergio", "Tomas", "Alvaro",
    "Ernesto", "Gustavo", "Hernan", "Marcelo", "Osvaldo", "Ruben",
    // Portugal / Brazil
    "Afonso", "Bruno", "Caio", "Diogo", "Duarte", "Henrique", "Joao",
    "Luiz", "Nuno", "Paulo", "Renato", "Thiago", "Tiago", "Vasco",
    "Vinicius",
    // Greece (romanized)
    "Dimitris", "Giorgos", "Kostas", "Nikos", "Panagiotis", "Spiros",
    "Stavros", "Thanos", "Vasilis", "Yannis", "Alexandros", "Christos",
    "Petros",
    // Iran
    "Reza", "Hossein", "Mehdi", "Arash", "Babak", "Dariush", "Farhad",
    "Kaveh", "Navid", "Omid", "Parviz", "Ramin", "Shahram", "Sohrab",
    // Pakistan / Bangladesh
    "Asif", "Junaid", "Kashif", "Nadeem", "Salman", "Shahid", "Usman",
    "Waqar", "Zafar", "Arif", "Habib", "Rafiq", "Shakil",
    // Philippines
    "Danilo", "Rodel", "Rolando", "Marlon", "Efren", "Nonito",
    // Thailand
    "Somchai", "Somsak", "Anan", "Kittisak", "Niran", "Prasert", "Sakda",
    "Wichai",
    // Slavic additions (romanized)
    "Ilya", "Yaroslav", "Vsevolod", "Arseny", "Timur", "Denis", "Egor",
    "Gleb", "Kirill", "Lev", "Matvei", "Nikita", "Rodion", "Semyon")

  private val tranche8Female = Seq(
    // Italy
    "Giulia", "Francesca", "Alessia", "Martina", "Giorgia", "Beatrice",
    "Eleonora", "Valentina", "Federica", "Silvia", "Paola", "Roberta",
    "Simona", "Alessandra", "Ilaria", "Chiara", "Elisa", "Serena",
    "Claudia", "Daniela", "Monica", "Stefania", "Laura", "Carla",
    // France
    "Amandine", "Aurelie", "Celine", "Chantal", "Delphine", "Elodie",
    "Florence", "Genevieve", "Isabelle", "Josephine", "Juliette",
    "Laetitia", "Manon", "Margaux", "Mathilde", "Oceane", "Pauline",
    "Sandrine", "Solene", "Sylvie", "Veronique", "Brigitte", "Colette",
    "Monique", "Nathalie", "Adele", "Capucine", "Clemence",
    // Spain / Latin America
    "Adriana", "Alejandra", "Beatriz", "Camila", "Carmen", "Catalina",
    "Clara", "Cristina", "Dolores", "Esperanza", "Estela", "Eva",
    "Fernanda", "Gabriela", "Guadalupe", "Ines", "Irene", "Josefina",
    "Juana", "Julieta", "Leticia", "Lorena", "Luciana", "Luisa",
    "Magdalena", "Manuela", "Marcela", "Margarita", "Mariana", "Marta",
    "Mercedes", "Milagros", "Natalia", "Noelia", "Paloma", "Pilar",
    "Raquel", "Rocio", "Rosario", "Soledad", "Valeria", "Veronica",
    "Ximena", "Yolanda",
    // Portugal / Brazil
    "Carolina", "Larissa", "Marilia", "Priscila", "Tatiana", "Vitoria",
    // Greece (romanized)
    "Eleni", "Katerina", "Despina", "Ioanna", "Vasiliki", "Anastasia",
    "Evangelia", "Dimitra",
    // Iran
    "Azadeh", "Fatemeh", "Leila", "Mahnaz", "Maryam", "Mina", "Nasrin",
    "Niloufar", "Parisa", "Roya", "Shirin", "Simin", "Zahra",
    // Pakistan / Bangladesh
    "Ayesha", "Bushra", "Farah", "Hina", "Nadia", "Rabia", "Saima",
    "Sana", "Shazia", "Uzma", "Zainab",
    // Philippines
    "Imelda", "Corazon", "Ligaya", "Marites", "Analyn", "Jocelyn",
    "Maricel", "Riza",
    // Thailand
    "Siriporn", "Sunisa", "Kanya", "Malee", "Pornthip", "Ratana",
    "Somying", "Duangjai",
    // Slavic / Eastern Europe (romanized)
    "Agnieszka", "Malgorzata", "Katarzyna", "Zofia", "Hanna", "Alicja",
    "Dorota", "Ewa", "Iwona", "Joanna", "Beata", "Bozena", "Danuta",
    "Halina", "Irena", "Jadwiga", "Wanda", "Milena", "Svetlana",
    "Tatyana", "Olga", "Irina", "Ekaterina", "Anastasiya", "Galina",
    "Lyudmila", "Nadezhda", "Oksana", "Polina", "Vera", "Yulia",
    "Zinaida", "Darya", "Ksenia", "Marina", "Larisa", "Raisa", "Alla",
    "Inna", "Nina", "Tamara",
    // Nordic
    "Astrid", "Birgitta", "Dagmar", "Ebba", "Freja", "Gunilla", "Hilda",
    "Ingeborg", "Karin", "Kerstin", "Linnea", "Maja", "Sigrid", "Solveig",
    "Thea", "Tuva", "Ulla", "Wilma", "Saga", "Signe")

  // Deliberately-resolved ambiguous names (the per-locale choice the
  // round-7 verdict asked to be documented rather than suffixed away).
  // Checked against the existing lists first — Ariel/Camille/Simone/
  // Marion/Sasha (female), Eli/Noam (male), Jules (mostly_male),
  // Eden/Sage/Dominique (mostly_female), Noor/Amal (locale tier) already
  // carry deliberate categories and are NOT duplicated here. The one
  // genuinely new case:
  //  - Nicola: male in Italian, female in English/German — usage-weighted
  //    mostly_male (the Italian male name dominates public corpora).
  private val tranche8MostlyMale = Seq("Nicola")

  // Round-9 breadth tranche (public census-style given-name lists):
  // the regions the round-8 sweep still left thin — Central Asia
  // (Kazakh/Uzbek/Azeri), the Caucasus (Armenia, Georgia), the Balkans
  // (Albania, Romania, Bulgaria, ex-Yugoslavia), the Baltics, Finland,
  // Hungary, Southeast Asia (Myanmar, Cambodia, Mongolia), the Celtic
  // nations (Wales, Ireland, Scotland), the Pacific (Māori, Samoa,
  // Tonga, Hawai'i), and East/West Africa (Swahili coast, Ethiopia,
  // Nigeria). Same discipline as earlier tranches: clearly-gendered
  // names only; unisex candidates (Janne, Nino, Uche, Desta, Sokha …)
  // are deliberately OMITTED rather than guessed; appended last so
  // core entries win conflicts.
  private val tranche9Male = Seq(
    // Kazakhstan / Kyrgyzstan
    "Nursultan", "Aibek", "Erlan", "Serik", "Bolat", "Daniyar", "Arman",
    "Yerlan", "Askar", "Marat", "Talgat", "Nurlan", "Kairat", "Azamat",
    // Uzbekistan / Tajikistan
    "Ulugbek", "Rustam", "Bekzod", "Jasur", "Shavkat", "Aziz", "Farrukh",
    "Javohir", "Sardor", "Shokhrukh",
    // Azerbaijan
    "Elnur", "Rashad", "Orkhan", "Vugar", "Ilham", "Elchin", "Tural",
    // Armenia
    "Armen", "Tigran", "Vahan", "Hayk", "Gevorg", "Aram", "Sargis",
    "Vardan", "Hovhannes",
    // Georgia
    "Giorgi", "Levan", "Irakli", "Zurab", "Davit", "Nodar", "Tornike",
    "Vakhtang", "Mamuka", "Givi",
    // Albania / Kosovo
    "Altin", "Arber", "Besnik", "Dritan", "Fatos", "Gezim", "Ilir",
    "Luan", "Valon", "Agron", "Shkelzen",
    // Romania / Moldova
    "Catalin", "Florin", "Ionut", "Mihai", "Radu", "Sorin", "Vlad",
    "Dragos", "Gheorghe", "Marius", "Nicusor", "Vasile", "Costel",
    // Bulgaria
    "Georgi", "Dimitar", "Stoyan", "Todor", "Hristo", "Plamen",
    "Veselin", "Zdravko", "Lyubomir", "Svetoslav",
    // ex-Yugoslavia beyond the round-7 Slavic core
    "Ante", "Davor", "Goran", "Ivica", "Josip", "Nenad", "Sinisa",
    "Zeljko", "Zlatko", "Branimir", "Hrvoje", "Mladen",
    // Lithuania
    "Mindaugas", "Gediminas", "Vytautas", "Mantas", "Saulius", "Arunas",
    "Kestutis", "Algirdas",
    // Latvia
    "Janis", "Andris", "Juris", "Valdis", "Guntis", "Maris",
    // Estonia
    "Jaan", "Tarmo", "Priit", "Urmas", "Margus", "Toomas", "Indrek",
    // Finland
    "Juha", "Mikko", "Pekka", "Timo", "Jari", "Antti", "Ville", "Matti",
    "Esa", "Heikki", "Ilkka", "Kimmo", "Lauri", "Olli", "Seppo", "Tapio",
    "Teemu", "Tuomas", "Veikko", "Juhani", "Jorma", "Kari", "Raimo",
    // Hungary beyond the diacritic core
    "Attila", "Bela", "Csaba", "Ferenc", "Gabor", "Gyula", "Imre",
    "Istvan", "Jozsef", "Karoly", "Laszlo", "Lajos", "Miklos", "Sandor",
    "Tamas", "Tibor", "Zoltan", "Zsolt", "Arpad", "Balazs", "Bence",
    "Gergely", "Levente",
    // Myanmar / Cambodia / Mongolia
    "Aung", "Kyaw", "Zaw", "Thant", "Rithy", "Vannak", "Batbayar",
    "Ganbold", "Sukhbaatar",
    // Wales
    "Rhys", "Gareth", "Dafydd", "Gwilym", "Emyr", "Aled", "Ieuan",
    "Owain",
    // Ireland / Scotland
    "Cormac", "Declan", "Eoin", "Fergus", "Lorcan", "Niall", "Padraig",
    "Tadhg", "Hamish", "Lachlan", "Angus", "Alasdair", "Fionnbarr",
    // Pacific (Māori, Samoa, Tonga, Hawai'i)
    "Tane", "Wiremu", "Sione", "Tevita", "Mosese", "Kekoa", "Keoni",
    // Swahili coast / East Africa
    "Juma", "Hamisi", "Bakari", "Jabari", "Omari", "Baraka",
    // Ethiopia / Eritrea
    "Dawit", "Yonas", "Bereket", "Mulugeta", "Haile", "Tewodros",
    "Getachew", "Fikru",
    // Nigeria (Igbo / Hausa / Yoruba beyond the round-7 core)
    "Chukwudi", "Ifeanyi", "Sani", "Musa", "Garba", "Aliyu", "Bello",
    "Chinonso", "Oluwaseun")

  private val tranche9Female = Seq(
    // Kazakhstan / Kyrgyzstan
    "Aigerim", "Aizhan", "Dinara", "Gulnara", "Saule", "Zarina",
    "Madina", "Gulmira", "Aliya", "Ainur", "Zhanar", "Asel",
    // Uzbekistan / Tajikistan
    "Nargiza", "Feruza", "Dilnoza", "Gulbahor", "Nilufar", "Zulfiya",
    // Azerbaijan
    "Aygun", "Gunel", "Leyla", "Nigar", "Sevinj", "Aysel", "Lamiya",
    // Armenia
    "Anahit", "Gayane", "Narine", "Lusine", "Armine", "Hasmik",
    "Siranush", "Shushan",
    // Georgia
    "Tamar", "Ketevan", "Natia", "Khatuna", "Salome", "Mariam", "Eka",
    "Maka", "Manana",
    // Albania / Kosovo
    "Albana", "Besa", "Blerta", "Drita", "Elira", "Flutura", "Mirela",
    "Teuta", "Valbona", "Shpresa",
    // Romania / Moldova
    "Ioana", "Andreea", "Raluca", "Mihaela", "Alina", "Corina",
    "Georgiana", "Ileana", "Lavinia", "Oana", "Rodica", "Viorica",
    "Anca", "Camelia", "Doina", "Lacramioara",
    // Bulgaria
    "Desislava", "Gergana", "Ivanka", "Nadya", "Radka", "Tsvetelina",
    "Yordanka", "Bilyana", "Stanislava",
    // ex-Yugoslavia
    "Dragana", "Gordana", "Jasna", "Ljiljana", "Mirjana", "Snezana",
    "Vesna", "Zorica", "Biljana", "Dubravka", "Jadranka",
    // Lithuania
    "Egle", "Ruta", "Ausra", "Daiva", "Jurga", "Rasa", "Vaida",
    "Gintare",
    // Latvia
    "Liga", "Inese", "Baiba", "Zane", "Ilze", "Dace",
    // Estonia
    "Kadri", "Tiiu", "Maarja", "Piret", "Kersti", "Epp",
    // Finland
    "Aino", "Tuula", "Paivi", "Ritva", "Pirkko", "Marjatta", "Anneli",
    "Kaisa", "Leena", "Minna", "Noora", "Outi", "Sanna", "Satu",
    "Terhi", "Tiina", "Virpi", "Eeva", "Maarit", "Sirpa", "Helmi",
    // Hungary
    "Erzsebet", "Ilona", "Katalin", "Margit", "Piroska", "Reka",
    "Timea", "Tunde", "Zsuzsanna", "Aniko", "Boglarka", "Csilla",
    "Eniko", "Gizella", "Gyongyi", "Ibolya", "Judit", "Kinga",
    "Orsolya",
    // Myanmar / Cambodia / Mongolia
    "Thida", "Sanda", "Bopha", "Channary", "Sreypov", "Enkhtuya",
    "Narantuya", "Bolormaa", "Oyunchimeg", "Sarangerel",
    // Wales
    "Angharad", "Bronwen", "Carys", "Eleri", "Ffion", "Nerys",
    "Rhiannon", "Sioned",
    // Ireland / Scotland
    "Aoife", "Aisling", "Caoimhe", "Ciara", "Niamh", "Orla", "Roisin",
    "Saoirse", "Sinead", "Siobhan", "Grainne", "Eilidh", "Isla",
    "Mairi", "Morag", "Senga",
    // Pacific
    "Aroha", "Moana", "Leilani", "Noelani", "Sina", "Litia",
    // Swahili coast / East Africa
    "Zuhura", "Mwanaisha", "Rehema", "Neema", "Subira", "Zawadi",
    "Amina",
    // Ethiopia / Eritrea
    "Almaz", "Aster", "Birtukan", "Genet", "Hirut", "Meseret",
    "Tigist", "Selamawit",
    // Nigeria
    "Ngozi", "Chioma", "Adaeze", "Nneka", "Chiamaka", "Funmilayo",
    "Yetunde", "Halima", "Hauwa")

  // Round-9 native-script tier: scripts the round-7 sweep didn't reach —
  // Ukrainian Cyrillic (distinct orthography from Russian), Thai,
  // Bengali, Tamil, Armenian, Georgian. Same transliteration-or-unknown
  // contract: a native-script name OUTSIDE these entries returns
  // `unknown`, never a silent transliteration guess.
  private val tranche9ScriptMale = Seq(
    // Ukrainian Cyrillic
    "Володимир", "Олександр", "Тарас", "Богдан", "Андрій", "Сергій",
    // Thai
    "สมชาย", "สมศักดิ์",
    // Bengali
    "রাহুল", "অমিত",
    // Tamil
    "அருண்", "கார்த்திக்",
    // Armenian script
    "Արմեն", "Տիգրան",
    // Georgian script (mkhedruli)
    "გიორგი", "ლევან", "ირაკლი")

  private val tranche9ScriptFemale = Seq(
    // Ukrainian Cyrillic
    "Оксана", "Наталія", "Ірина", "Катерина", "Олена", "Тетяна",
    // Thai
    "ศิริพร", "สมหญิง",
    // Bengali
    "প্রিয়া", "অনন্যা",
    // Tamil
    "பிரியா", "தீபிகா",
    // Armenian script
    "Անահիտ", "Գայանե",
    // Georgian script
    "თამარ", "ნათია")

  // Round-10 breadth tranche (public census-style given-name lists):
  // regions the round-9 sweep still left thin — the Low Countries,
  // Portugal/Brazil, deeper Poland + Czech/Slovak, Indonesia/Malaysia,
  // the Philippines (second sweep), Sri Lanka, Nepal, Cambodia/Laos,
  // West Africa (Akan day names, more Yoruba/Igbo/Hausa), Southern
  // Africa (Zulu/Xhosa/Sotho/Shona), Somalia, the Caribbean/Haiti.
  // Same discipline: clearly-gendered names only; unisex candidates
  // (Ayo, Chi, Nhlanhla, Bongani-as-surname cases, Dominique …) are
  // deliberately OMITTED rather than guessed; appended last so core
  // entries win conflicts.
  private val tranche10Male = Seq(
    // Netherlands / Flanders
    "Daan", "Sem", "Bram", "Thijs", "Lars", "Jeroen", "Sander", "Wouter",
    "Gijs", "Maarten", "Pieter", "Joost", "Bas", "Koen", "Ruben", "Stijn",
    "Niels", "Jelle", "Sven", "Teun", "Willem", "Hendrik", "Cornelis",
    // Portugal / Brazil
    "Joao", "Tiago", "Goncalo", "Duarte", "Vasco", "Nuno", "Rui",
    "Henrique", "Caio", "Thiago", "Mateus", "Gustavo", "Rafael", "Renato",
    "Rodrigo", "Marcelo", "Leandro", "Wellington", "Everton", "Vinicius",
    "Otavio", "Emerson",
    // Poland (deeper)
    "Wojciech", "Krzysztof", "Grzegorz", "Tomasz", "Mariusz", "Zbigniew",
    "Slawomir", "Przemyslaw", "Rafal", "Pawel", "Michal", "Jakub",
    "Szymon", "Bartosz", "Dawid", "Kamil", "Lukasz", "Marcin", "Piotr",
    "Radoslaw", "Waldemar", "Janusz", "Tadeusz", "Leszek",
    // Czechia / Slovakia
    "Jiri", "Ondrej", "Vaclav", "Zdenek", "Milos", "Bohumil", "Radek",
    "Vit", "Miroslav", "Lubomir", "Frantisek", "Vladislav", "Dusan",
    "Matej", "Marek", "Tomas", "Stanislav", "Rastislav", "Juraj",
    // Indonesia / Malaysia
    "Budi", "Agus", "Bambang", "Hendra", "Joko", "Slamet", "Sutrisno",
    "Wahyu", "Yudi", "Taufik", "Firman", "Rizky", "Fajar", "Hafiz",
    "Syafiq", "Amirul", "Azlan", "Rosli", "Zulkifli", "Khairul",
    // Philippines (second sweep)
    "Bayani", "Crisanto", "Danilo", "Edgardo", "Feliciano", "Gregorio",
    "Isagani", "Lorenzo", "Mariano", "Nestor", "Ponciano", "Rodel",
    "Teodoro", "Virgilio", "Wilfredo",
    // Sri Lanka (Sinhala romanized)
    "Nuwan", "Chaminda", "Kumar", "Lasith", "Mahela", "Sanath",
    "Tillakaratne", "Dinesh", "Angelo", "Kusal", "Dimuth", "Suranga",
    // Nepal
    "Bishal", "Dipesh", "Gopal", "Hari", "Krishna", "Madhav", "Narayan",
    "Prakash", "Rajendra", "Shyam", "Umesh", "Yadav", "Bikram", "Deepak",
    // Cambodia / Laos
    "Sovan", "Rithy", "Veasna", "Dara", "Boun", "Khamla", "Somphone",
    "Sisavath", "Phet", "Bounmy",
    // West Africa: Akan male day names + Yoruba/Igbo/Hausa
    "Kwame", "Kofi", "Kwabena", "Kwaku", "Yaw", "Kwesi", "Kwadwo",
    "Adebayo", "Babatunde", "Olusegun", "Oluwaseun", "Ademola", "Femi",
    "Segun", "Emeka", "Obinna", "Chinedu", "Ikenna", "Nnamdi", "Kelechi",
    "Abubakar", "Aliyu", "Bello", "Garba", "Musa", "Sani", "Usman",
    // Southern Africa
    "Sipho", "Thabo", "Mandla", "Sibusiso", "Themba", "Bheki", "Vusi",
    "Tshepo", "Kagiso", "Lefa", "Tendai", "Tafadzwa", "Farai", "Tinashe",
    // Somalia
    "Abdirahman", "Abdullahi", "Liban", "Warsame", "Farah", "Guled",
    // Caribbean / Haiti
    "Jean-Baptiste", "Wyclef", "Dieudonne", "Toussaint", "Emmanuel",
    "Reginald", "Stevenson", "Fabrice")

  private val tranche10Female = Seq(
    // Netherlands / Flanders
    "Sanne", "Femke", "Lotte", "Maud", "Fleur", "Anouk", "Marloes",
    "Nienke", "Iris", "Tess", "Roos", "Lieke", "Jantine", "Annemarie",
    "Marieke", "Wilhelmina", "Geertruida", "Johanna", "Saskia", "Brechtje",
    // Portugal / Brazil
    "Mariana", "Catarina", "Beatriz", "Ines", "Margarida", "Leonor",
    "Matilde", "Madalena", "Larissa", "Leticia", "Juliana", "Camila",
    "Fernanda", "Patricia", "Vanessa", "Tatiane", "Raquel", "Bruna",
    "Thais", "Aline", "Luana", "Graziela",
    // Poland (deeper)
    "Malgorzata", "Agnieszka", "Katarzyna", "Joanna", "Magdalena",
    "Aleksandra", "Zofia", "Helena", "Janina", "Danuta", "Grazyna",
    "Jadwiga", "Bozena", "Urszula", "Elzbieta", "Beata", "Dorota",
    "Iwona", "Justyna", "Karolina", "Monika", "Patrycja", "Sylwia",
    "Wioletta", "Zuzanna",
    // Czechia / Slovakia
    "Jana", "Hana", "Vera", "Alena", "Ludmila", "Marcela", "Ivana",
    "Zdenka", "Bozena", "Jarmila", "Miroslava", "Katerina", "Tereza",
    "Barbora", "Kristyna", "Adela", "Lucie", "Michaela", "Veronika",
    // Indonesia / Malaysia
    "Siti", "Dewi", "Sri", "Ratna", "Yanti", "Wati", "Lestari", "Indah",
    "Fitri", "Ayu", "Nurul", "Aisyah", "Zainab", "Rohani", "Faridah",
    "Noraini", "Azizah", "Salmah", "Hasnah", "Rosmah",
    // Philippines (second sweep)
    "Corazon", "Imelda", "Luzviminda", "Remedios", "Rosario", "Teresita",
    "Violeta", "Zenaida", "Lourdes", "Milagros", "Perlita", "Consuelo",
    // Sri Lanka
    "Sanduni", "Hansika", "Dilani", "Nayana", "Chamari", "Shashika",
    "Anusha", "Kumari", "Nilmini", "Dulani",
    // Nepal
    "Sita", "Gita", "Laxmi", "Parvati", "Sarita", "Sunita", "Kamala",
    "Radha", "Bimala", "Durga", "Sabina", "Pratima",
    // Cambodia / Laos
    "Sophea", "Channary", "Bopha", "Sreymom", "Chantha", "Malis",
    "Khamphone", "Viengkham", "Noy", "Chanthavy",
    // West Africa: Akan female day names + Yoruba/Igbo/Hausa
    "Akosua", "Adwoa", "Abena", "Akua", "Yaa", "Afua", "Ama",
    "Folasade", "Yemisi", "Bukola", "Funmilayo", "Omolara", "Titilayo",
    "Adaeze", "Chioma", "Ifeoma", "Nneka", "Ngozika", "Chiamaka",
    "Amina", "Hadiza", "Maryam", "Zainabu", "Safiya", "Jamila",
    // Southern Africa
    "Thandiwe", "Nomvula", "Zanele", "Ntombi", "Lindiwe", "Busisiwe",
    "Nosipho", "Palesa", "Dikeledi", "Refilwe", "Rudo", "Chipo",
    "Vimbai", "Tariro", // (Nyasha is unisex — omitted, not guessed)
    // Somalia
    "Amina", "Hodan", "Sagal", "Ubah", "Ayan", "Deqa",
    // Caribbean / Haiti
    "Widelene", "Fabienne", "Mirlande", "Roseline", "Guerline",
    "Nadege", "Yolande")

  // Round-10 native-script tier: Japanese kana, Sinhala, Khmer, Lao,
  // Amharic (Ge'ez fidel), Serbian Cyrillic, deeper Greek. Same
  // transliteration-or-unknown contract.
  // Round-10 SECOND breadth tranche (public census-style given-name
  // lists): the largest-population regions whose depth was still thin
  // after the first round-10 sweep — South India (Tamil/Telugu/Kannada/
  // Malayalam), Maharashtra/Gujarat/Bengal, Pakistan/Bangladesh, Japan,
  // Korea, China (pinyin), Thailand, Vietnam (second sweep), Iran
  // (deeper), Turkey (deeper), Italy/Spain traditional long tails, and
  // Scandinavia (deeper). Same discipline as every tranche: clearly-
  // gendered names only; unisex candidates (Kiran, Suman, Noor, Yuki,
  // Haruka, Min, Wei, Dung, Hieu, Khanh, Phuong, Baris, Rosario,
  // Gurpreet and the broadly-unisex Sikh -preet/-inder family …) are
  // deliberately OMITTED rather than guessed; appended last so core
  // entries win conflicts.
  private val tranche10bMale = Seq(
    // South India
    "Murugan", "Senthil", "Karthik", "Arun", "Vijay", "Suresh", "Ramesh",
    "Ganesh", "Mahesh", "Venkatesh", "Srinivas", "Balaji", "Muthu",
    "Selvam", "Dhanush", "Sivakumar", "Chandrasekhar", "Subramaniam",
    "Nagarjuna", "Prabhakar", "Sundar", "Shankar", "Raghavan", "Ilango",
    // Maharashtra / Gujarat / Bengal
    "Ganpat", "Vitthal", "Bhalchandra", "Dattatray", "Shivaji", "Sachin",
    "Ajinkya", "Nilesh", "Mangesh", "Prashant", "Sandeep", "Santosh",
    "Vikas", "Jignesh", "Hardik", "Chirag", "Paresh", "Kaushik",
    "Dhaval", "Bhavesh", "Nimesh", "Subhash", "Debashish", "Somnath",
    "Biswajit", "Pranab", "Sourav", "Arindam", "Anirban", "Tapan",
    // Pakistan / Bangladesh
    "Imran", "Faisal", "Shahid", "Javed", "Tariq", "Naveed", "Shoaib",
    "Wasim", "Waqar", "Zubair", "Junaid", "Kamran", "Adnan", "Fahad",
    "Saqib", "Zeeshan", "Shafiqul", "Mizanur", "Moinul",
    // Japan (romanized)
    "Hiroshi", "Takeshi", "Kenji", "Taro", "Jiro", "Ichiro", "Kazuo",
    "Akio", "Osamu", "Isamu", "Susumu", "Tadashi", "Satoshi", "Takashi",
    "Masashi", "Kenta", "Daiki", "Ryota", "Haruto", "Sota",
    // Korea (romanized, male-dominant only)
    "Minho", "Jihoon", "Jaeho", "Sangwoo", "Kyungho", "Seungho",
    // China (pinyin given names, clearly gendered)
    "Jianguo", "Jianjun", "Zhiqiang", "Zhigang", "Guoqiang", "Haifeng",
    "Xiaoming", "Weidong",
    // Thailand
    "Somchai", "Somsak", "Prasert", "Sombat", "Chatchai", "Kittisak",
    "Surachai", "Narong", "Weerasak",
    // Vietnam (second sweep, male-dominant only)
    "Cuong", "Manh", "Tuan", "Thang",
    // Iran (deeper)
    "Dariush", "Kourosh", "Siavash", "Babak", "Kaveh", "Farhad",
    "Behrouz", "Khosrow", "Jamshid", "Bijan", "Manouchehr", "Parviz",
    // Turkey (deeper)
    "Selim", "Orhan", "Halil", "Ferhat", "Serdar", "Volkan", "Tolga",
    "Burak", "Oguz", "Levent", "Koray",
    // Italy (traditional long tail)
    "Massimo", "Giancarlo", "Pierluigi", "Gianfranco", "Ettore",
    "Amedeo", "Fulvio", "Tiziano", "Osvaldo", "Gennaro", "Ciro",
    "Rocco", "Aldo", "Dino", "Italo",
    // Spain (traditional long tail)
    "Anselmo", "Baldomero", "Eusebio", "Fulgencio", "Hipolito",
    "Maximiliano", "Nicanor", "Porfirio", "Teofilo", "Aurelio", "Isidro",
    // Scandinavia (deeper)
    "Torbjorn", "Asbjorn", "Oddvar", "Halvard", "Sverre", "Trygve",
    "Gudmund", "Steinar", "Terje", "Vidar", "Yngve", "Snorri")

  private val tranche10bFemale = Seq(
    // South India
    "Lakshmi", "Saraswati", "Meenakshi", "Kavitha", "Revathi", "Padma",
    "Vasantha", "Janaki", "Kamala", "Radha", "Savitri", "Bhavani",
    "Lalitha", "Sumathi", "Vimala", "Chitra", "Malathi", "Shanthi",
    "Devika", "Yamuna",
    // Maharashtra / Gujarat / Bengal / Bollywood-era staples
    "Aishwarya", "Deepika", "Priyanka", "Madhuri", "Sushmita",
    "Sharmila", "Aparna", "Suchitra", "Mamata", "Manisha", "Archana",
    "Vandana", "Anjali", "Pallavi", "Shraddha", "Tanvi", "Ishita",
    "Payal", "Gauri", "Falguni",
    // Pakistan / Bangladesh
    "Ayesha", "Saima", "Uzma", "Rabia", "Sana", "Hina", "Nazia",
    "Shazia", "Samina", "Farhana", "Tahmina", "Rokeya", "Taslima",
    // Japan (romanized)
    "Hanako", "Sakura", "Yumiko", "Keiko", "Akiko", "Yoko", "Michiko",
    "Emiko", "Kazuko", "Sachiko", "Ayumi", "Aiko", "Yui", "Mio",
    "Misaki", "Nanami",
    // Korea (romanized, female-dominant only)
    "Eunji", "Soyeon", "Hyejin", "Minji", "Yuna", "Seoyeon",
    // China (pinyin given names, clearly gendered)
    "Xiaohong", "Xiuying", "Guiying", "Meiling", "Xiaoyan", "Lijuan",
    "Meifang", "Shufen",
    // Thailand
    "Somsri", "Siriporn", "Kanokwan", "Pimchanok", "Sunisa", "Ratree",
    "Duangjai", "Orathai", "Wipada", "Malee",
    // Vietnam (second sweep, female-dominant only)
    "Huong", "Thuy", "Trang", "Nga",
    // Iran (deeper)
    "Shirin", "Golnaz", "Mahnaz", "Farahnaz", "Parisa", "Niloufar",
    "Roya", "Mahsa", "Nasrin", "Simin", "Forough", "Laleh", "Azadeh",
    // Turkey (deeper)
    "Hatice", "Emine", "Songul", "Nurgul", "Tugba", "Busra", "Gamze",
    "Sibel", "Pinar", "Gulsen",
    // Italy (traditional long tail)
    "Carmela", "Filomena", "Rosaria", "Concetta", "Assunta", "Nunzia",
    "Pierina", "Gianna", "Mirella", "Ornella", "Fiorella", "Antonella",
    "Donatella", "Simonetta", "Marisa", "Annunziata", "Immacolata",
    // Spain (traditional long tail)
    "Amparo", "Remedios", "Milagros", "Socorro", "Inmaculada",
    "Encarnacion", "Purificacion", "Esperanza", "Soledad", "Araceli",
    "Maribel", "Montserrat",
    // Scandinavia (deeper)
    "Ragnhild", "Solveig", "Gunhild", "Torunn", "Ingeborg", "Sigrun",
    "Thora", "Oddny", "Magnhild", "Vigdis")

  // native scripts NOT yet covered by earlier script tranches:
  // Devanagari, Tamil, Bengali, Hangul, Thai, CJK
  private val tranche10bScriptMale = Seq(
    "राजेश", "सुरेश", // Devanagari
    "முருகன்", "கார்த்திக்", // Tamil
    "সুভাষ", // Bengali
    "민호", "지훈", // Hangul
    "สมชาย", "สมศักดิ์", // Thai
    "建国", "志强") // CJK (pinyin twins above)

  private val tranche10bScriptFemale = Seq(
    "सीता", "गीता",
    "லட்சுமி", "கவிதா",
    "রোকেয়া",
    "지은", "민지",
    "สมศรี", "ศิริพร",
    "秀英", "美玲")

  private val tranche10ScriptMale = Seq(
    // Japanese kana/kanji given names (clearly male)
    "たろう", "ひろし", "タロウ", "ケンジ",
    // Sinhala
    "නුවන්", "කසුන්",
    // Khmer
    "សុខា", "វិសាល",
    // Lao
    "ສົມສັກ", "ບຸນມີ",
    // Amharic
    "ዳዊት", "ተስፋዬ",
    // Serbian Cyrillic
    "Милош", "Драган", "Небојша", "Златан",
    // Greek (deeper)
    "Αλέξανδρος", "Θοδωρής", "Μιχάλης")

  private val tranche10ScriptFemale = Seq(
    // Japanese kana
    "はなこ", "ゆき", "ハナコ", "サクラ",
    // Sinhala
    "සඳුනි", "දිලානි",
    // Khmer
    "សុភា", "ចន្ថា",
    // Lao
    "ຈັນທະວີ", "ນ້ອຍ",
    // Amharic
    "ትግስት", "አበባ",
    // Serbian Cyrillic
    "Милица", "Драгана", "Јелена", "Златица",
    // Greek (deeper)
    "Αναστασία", "Παρασκευή", "Ευαγγελία")

  // Round-11 breadth tranche (public census-style given-name lists):
  // regions the round-10 sweep still left thin — Gaelic Ireland/
  // Scotland, Iceland (deeper), Finland (deeper), the ex-Yugoslav
  // Balkans + Slovenia (deeper), Albania/Kosovo (deeper), Central Asia
  // (Uzbek/Kyrgyz/Kazakh/Tajik/Turkmen, deeper), Mongolia, romanized
  // Korea (hyphenated given names), Myanmar, East Africa (Kikuyu/Luo/
  // Kalenjin/Swahili/Buganda), Ethiopia/Eritrea. Same discipline as
  // every tranche: clearly-gendered names only; unisex candidates
  // (Tenzin, Pema, Ji-woo, Moe, Meron, Erdene, Tumusiime, Selam …)
  // are deliberately OMITTED rather than guessed; appended last so
  // core entries win conflicts.
  private val tranche11Male = Seq(
    // Ireland / Scotland (Gaelic deeper)
    "Seamus", "Padraig", "Cormac", "Donnacha", "Tadhg", "Fergus",
    "Lorcan", "Ruairi", "Cathal", "Diarmuid", "Senan", "Fionn",
    "Odhran", "Eamon", "Malachy", "Hamish", "Lachlan", "Angus",
    "Fraser", "Murdo", "Alasdair", "Gregor", "Ewan", "Struan",
    // Iceland / Faroes (deeper)
    "Sigurdur", "Gudmundur", "Snorri", "Thorsteinn", "Baldur",
    "Hjalmar", "Leifur", "Kjartan", "Orri", "Bjarni", "Haukur",
    "Sverrir", "Vilhjalmur",
    // Finland (deeper)
    "Tapio", "Ilkka", "Pekka", "Seppo", "Kalevi", "Veikko", "Armas",
    "Onni", "Eino", "Vaino", "Aatos", "Taisto", "Reijo", "Raimo",
    // Balkans deeper (Serbian/Croatian/Bosnian/Macedonian/Slovene)
    "Aleksandar", "Bojan", "Nemanja", "Slobodan", "Zoran", "Dragomir",
    "Milorad", "Predrag", "Radovan", "Srdjan", "Vuk", "Zeljko",
    "Dalibor", "Zlatko", "Mirko", "Branimir", "Davor", "Domagoj",
    "Kresimir", "Vedran", "Zvonimir", "Hrvoje", "Mislav", "Edin",
    "Senad", "Haris", "Blaz", "Ziga", "Bostjan", "Primoz", "Gasper",
    "Trajko", "Metodija",
    // Albania / Kosovo (deeper)
    "Blerim", "Arber", "Bujar", "Dritan", "Fatos", "Gezim", "Ilir",
    "Kujtim", "Luan", "Shkelzen", "Valon", "Ardit",
    // Central Asia (deeper)
    "Sherzod", "Bekzod", "Ulugbek", "Shavkat", "Rustam", "Jasur",
    "Otabek", "Sardor", "Botir", "Davron", "Farhod", "Bakhtiyor",
    "Firdavs", "Ulan", "Azamat", "Talant", "Kubanychbek", "Bekzat",
    "Yerlan", "Serik", "Marat", "Daniyar", "Galymzhan", "Dovlet",
    "Serdar",
    // Mongolia (clearly male compounds; bare Erdene/Otgon are unisex)
    "Baatar", "Sukhbaatar", "Batbold", "Ganbold", "Munkhbat",
    "Batsaikhan", "Ganzorig", "Chuluunbold", "Tsogtbayar",
    // Korea (romanized, hyphenated male given names)
    "Min-jun", "Do-yun", "Ji-ho", "Hyun-woo", "Eun-woo", "Ji-hoon",
    "Jae-hyun", "Dong-hyun", "Sung-min", "Young-ho", "Byung-ho",
    "Tae-yang", "Joon-ho", "Sang-woo", "Kwang-soo",
    // Myanmar (clearly male; Moe/Htet/Soe are unisex and omitted)
    "Htun", "Zaw", "Kyaw", "Thura", "Nyan", "Naing", "Zeya", "Thiha",
    // East Africa: Kikuyu, Luo, Kalenjin (Kip- prefix), Swahili,
    // Buganda (Kato/Wasswa are the male twin names)
    "Mwangi", "Kamau", "Njoroge", "Kariuki", "Gitau", "Otieno",
    "Ochieng", "Odhiambo", "Owino", "Onyango", "Kipchoge",
    "Kiprotich", "Kipkorir", "Juma", "Jomo", "Baraka", "Rashidi",
    "Selemani", "Okello", "Opio", "Mugisha", "Kato", "Wasswa",
    "Kizza",
    // Ethiopia / Eritrea
    "Tadesse", "Tesfaye", "Girma", "Getachew", "Bekele", "Alemu",
    "Mulugeta", "Demissie", "Kebede", "Dawit", "Yohannes", "Teklu",
    "Fikru", "Mekonnen", "Berhanu", "Asfaw", "Tewodros", "Amanuel",
    "Biniam", "Henok", "Robel", "Yonas", "Efrem")

  private val tranche11Female = Seq(
    // Ireland / Scotland (Gaelic deeper)
    "Saoirse", "Niamh", "Siobhan", "Grainne", "Orla", "Aisling",
    "Clodagh", "Roisin", "Maeve", "Caoimhe", "Sinead", "Eilidh",
    "Mairi", "Morag", "Iona", "Mhairi",
    // Iceland (deeper)
    "Sigridur", "Gudrun", "Hildur", "Bryndis", "Steinunn", "Thorunn",
    "Margret", "Svanhildur", "Unnur", "Halldora", "Salvor",
    // Finland (deeper)
    "Tuula", "Pirjo", "Ritva", "Marjatta", "Anneli", "Kaarina",
    "Helvi", "Sirkka", "Terttu", "Tellervo", "Vuokko", "Mirja",
    "Paivi", "Tarja", "Minna", "Katri",
    // Balkans deeper
    "Dragana", "Milica", "Snezana", "Vesna", "Danica", "Gordana",
    "Radmila", "Slavica", "Zorica", "Biljana", "Ljiljana", "Mirjana",
    "Dubravka", "Nevena", "Tijana", "Jasmina", "Amra", "Lejla",
    "Emina", "Azra", "Mojca", "Spela", "Urska", "Alenka", "Tjasa",
    // Albania / Kosovo (deeper)
    "Albana", "Blerta", "Drita", "Fatmira", "Teuta", "Valbona",
    "Shqipe", "Arjeta",
    // Central Asia (deeper)
    "Gulnara", "Dilnoza", "Feruza", "Gulbahor", "Nilufar", "Sevara",
    "Shahnoza", "Zebo", "Aizhan", "Aigul", "Ainura", "Gulmira",
    "Zhanar", "Dinara", "Saltanat", "Symbat", "Tolganay", "Cholpon",
    "Aidai", "Jamilya",
    // Mongolia (-tsetseg "flower" / -maa suffixes are female)
    "Altantsetseg", "Narantsetseg", "Bolormaa", "Sarangerel",
    "Tsetsegmaa", "Oyuunchimeg", "Khulan",
    // Korea (romanized, hyphenated female given names)
    "Seo-yeon", "Ha-eun", "Ye-jin", "Soo-ah", "Ji-yeon", "Eun-ji",
    "Hye-jin", "Min-ji", "Yu-na", "Chae-won", "Da-eun", "Na-yeon",
    "So-yeon", "Ye-eun", "Mi-sook", "Eun-kyung", "Hyo-joo",
    // Myanmar
    "Sanda", "Thandar", "Nilar", "Hnin", "Phyu", "Thuzar", "Yadana",
    "Theingi",
    // East Africa: Kikuyu, Luo, Kalenjin (Che-/Jep- prefixes),
    // Swahili, Buganda (Nakato/Babirye are the female twin names)
    "Wanjiru", "Wanjiku", "Njeri", "Nyokabi", "Wambui", "Muthoni",
    "Akinyi", "Achieng", "Atieno", "Awino", "Adhiambo", "Chebet",
    "Chepkoech", "Jepkosgei", "Nakato", "Babirye", "Nansubuga",
    "Neema", "Rehema", "Upendo", "Zuhura", "Mwanaisha",
    // Ethiopia / Eritrea
    "Almaz", "Abeba", "Tigist", "Hiwot", "Meseret", "Genet", "Aster",
    "Birtukan", "Mulu", "Senait", "Rahel", "Bethlehem", "Saba",
    "Tsehay", "Worknesh", "Yeshi", "Zewditu", "Luam")

  // native scripts for the round-11 regions: Hangul (hyphenated pairs
  // above), Mongolian Cyrillic, Ethiopic, Burmese, Georgian (deeper)
  private val tranche11ScriptMale = Seq(
    "민준", "현우", // Hangul
    "Баатар", "Ганболд", // Mongolian Cyrillic
    "ተስፋዬ", "ዮናስ", // Ethiopic
    "ကျော်", "သီဟ", // Burmese
    "ლევანი", "ზურაბი") // Georgian

  private val tranche11ScriptFemale = Seq(
    "서연", "하은",
    "Болормаа", "Сарангэрэл",
    "አልማዝ", "ሕይወት",
    "သန္တာ", "နီလာ",
    "ნინო", "თამარი")


  // Round-12 breadth tranche (public census-style given-name lists):
  // depth passes over pools the earlier sweeps only skimmed — older/
  // regional stock across Italy, Iberia/Latin America, Germany, France,
  // Russia, Greece, Portugal/Brazil, Poland, Scandinavia, the Low
  // Countries, the Arab world, Iran, Turkey; South India (Tamil/Telugu/
  // Kannada/Malayalam), Bengal, Korea (hyphenated romanizations), Japan
  // (classic -ko female stock), Indonesia, the Philippines, Thailand,
  // Vietnam; Maori/Fijian/Hawaiian/Tongan depth; South Sudan (Dinka/
  // Nuer), Ethiopia depth, the Levant, Israel. Same discipline as every
  // tranche: clearly-gendered names only; unisex candidates (Xuan,
  // Cemre, Manaia, Kainoa, Rosario, Guadalupe, Hye-sung, Ji-woo …) are
  // deliberately OMITTED rather than guessed; appended last so core
  // entries win conflicts ("Nino" stays out entirely: male in Italian,
  // female in Georgian).
  private val tranche12Male = Seq(
    "Saravanan", "Bongani", "Hicham", "Noureddine", "Brahim", "Quoc",
    "Rangi", "Hemi", "Tavita", "Viliame", "Subhas", "Souvik", "Debashis",
    "Pasquale", "Ottavio", "Raffaele", "Tullio", "Dante", "Ugo", "Ermanno",
    "Lamberto", "Oreste", "Quirino", "Settimio", "Anacleto", "Faustino",
    "Ruperto", "Casimiro", "Celestino", "Eleuterio", "Evaristo",
    "Heriberto", "Isidoro", "Leoncio", "Remigio", "Saturnino", "Telesforo",
    "Ubaldo", "Venancio", "Gottfried", "Hartmut", "Eckhard", "Reinhold",
    "Burkhard", "Volkmar", "Wilfried", "Adalbert", "Meinhard", "Notker",
    "Raimund", "Traugott", "Aurelien", "Barthelemy", "Corentin", "Cyprien",
    "Donatien", "Gontran", "Hippolyte", "Leandre", "Octave", "Philibert",
    "Sylvestre", "Theophile", "Ulysse", "Arkady", "Innokenty", "Kuzma",
    "Makar", "Miron", "Nazar", "Platon", "Prokhor", "Savely", "Seraphim",
    "Spartak", "Taras", "Tikhon", "Trofim", "Yefim", "Zakhar",
    "Charalampos", "Anargyros", "Apostolos", "Aristotelis", "Chrysostomos",
    "Efstathios", "Epaminondas", "Evangelos", "Gerasimos", "Kleanthis",
    "Leonidas", "Menelaos", "Miltiadis", "Nektarios", "Panteleimon",
    "Polykarpos", "Sotirios", "Themistoklis", "Thrasyvoulos", "Anibal",
    "Belmiro", "Custodio", "Delfim", "Gualter", "Heitor", "Ilidio",
    "Joaquim", "Narciso", "Olavo", "Rogerio", "Telmo", "Valdemar", "Zenon",
    "Bronislaw", "Czeslaw", "Eustachy", "Hieronim", "Mieczyslaw",
    "Seweryn", "Waclaw", "Wawrzyniec", "Zdzislaw", "Ingvar", "Jorgen",
    "Kjell", "Njord", "Ragnvald", "Sindre", "Torgeir", "Vegard", "Barend",
    "Coenraad", "Diederik", "Evert", "Floris", "Gijsbert", "Huib", "Izaak",
    "Koert", "Lodewijk", "Okke", "Reinier", "Teunis", "Mazen", "Fawzi",
    "Ghazi", "Hani", "Issam", "Kamel", "Lutfi", "Mahdi", "Riyad", "Yasir",
    "Zuhair", "Ardeshir", "Bahram", "Esfandiar", "Fereydoun", "Hormoz",
    "Jahangir", "Kambiz", "Nader", "Rostam", "Shapur", "Teymur", "Ilker",
    "Cagatay", "Alpaslan", "Bulent", "Dogan", "Gokhan", "Ilhan", "Mesut",
    "Nazim", "Polat", "Recep", "Taner", "Ufuk", "Vedat", "Zeki",
    "Chidambaram", "Kumaravel", "Manikandan", "Nagarajan", "Palanisamy",
    "Rajendran", "Thirumal", "Vadivel", "Velu", "Venkataraman",
    "Jagannath", "Kasinath", "Lokanath", "Madhusudan", "Nilkanth",
    "Omkarnath", "Raghunath", "Trilochan", "Vishwanath", "Amitava",
    "Bhaskar", "Chiranjib", "Dibakar", "Gautam", "Himadri", "Jayanta",
    "Kalyan", "Manindra", "Nirmal", "Prasanta", "Ranjan", "Saumitra",
    "Uttam", "Myung-soo", "Chul-soo", "Norio", "Takehiko", "Yasuhiro",
    "Kazuhiko", "Mitsuru", "Nobuyuki", "Ryoichi", "Tsuyoshi", "Yoshinori",
    "Hideaki", "Katsumi", "Gunawan", "Hartono", "Kuntoro", "Priyo",
    "Teguh", "Wahyudi", "Purnomo", "Crisostomo", "Florante", "Macario",
    "Panfilo", "Kailash", "Lokesh", "Omprakash", "Shailesh", "Yogesh",
    "Thanawat", "Thanakorn", "Weerachai", "Anurak", "Decha", "Bao", "Phat",
    "Son", "Thinh", "Toan", "Tamati", "Nikau", "Rawiri", "Tipene", "Hoani",
    "Matiu", "Paora", "Ruka", "Sefanaia", "Epeli", "Inoke", "Peni",
    "Savenaca", "Taniela", "Waisale", "Kealoha", "Kimo", "Makoa", "Nainoa",
    "Ikaika", "Gatluak", "Majok", "Alemayehu", "Hailu", "Lemma", "Negash",
    "Wondimu", "Zerihun", "Boutros", "Fares", "Maroun", "Nakhle", "Sarkis",
    "Tanios", "Eyal", "Nadav", "Itai", "Alon", "Boaz", "Ronen", "Yair",
    "Asaf")

  private val tranche12Female = Seq(
    "Souad", "Loubna", "Imane", "Hila", "Hine", "Mele", "Raissa", "Iara",
    "Mousumi", "Paromita", "Santina", "Addolorata", "Clelia", "Domenica",
    "Gelsomina", "Loredana", "Palmira", "Quintina", "Rosalba", "Silvana",
    "Tersilla", "Vincenza", "Asuncion", "Candelaria", "Feliciana",
    "Hortensia", "Natividad", "Obdulia", "Perpetua", "Visitacion",
    "Zoraida", "Adelheid", "Brunhilde", "Edeltraud", "Friedelinde",
    "Gerlinde", "Irmgard", "Kunigunde", "Lieselotte", "Ottilie", "Traudel",
    "Apolline", "Eglantine", "Felicienne", "Honorine", "Leontine",
    "Noemie", "Odile", "Perrine", "Segolene", "Victorine", "Agrafena",
    "Antonina", "Evdokia", "Glafira", "Kapitolina", "Marfa", "Pelageya",
    "Praskovya", "Serafima", "Taisia", "Ulyana", "Varvara", "Yevdokia",
    "Anthoula", "Aspasia", "Chrysoula", "Efthymia", "Fotini", "Garyfallia",
    "Kalliopi", "Kleio", "Magdalini", "Olympia", "Panagiota", "Polyxeni",
    "Stavroula", "Theodora", "Zinovia", "Albertina", "Benedita",
    "Conceicao", "Deolinda", "Ermelinda", "Filipa", "Graciete",
    "Hortencia", "Ilda", "Natercia", "Odete", "Rosalina", "Urbana",
    "Zulmira", "Boleslawa", "Czeslawa", "Eufemia", "Honorata", "Kazimiera",
    "Miroslawa", "Pelagia", "Radoslawa", "Stanislawa", "Waleria",
    "Wieslawa", "Aslaug", "Bodil", "Dagny", "Eldrid", "Gunvor", "Hjordis",
    "Ingebjorg", "Jorunn", "Oddbjorg", "Ragnfrid", "Aaltje", "Dieuwke",
    "Elske", "Geertje", "Hendrika", "Jacoba", "Klaasje", "Lammertje",
    "Neeltje", "Pietertje", "Rinske", "Sjoukje", "Trijntje", "Afaf",
    "Dalal", "Fadwa", "Ibtisam", "Kawthar", "Qamar", "Rabab", "Thuraya",
    "Yusra", "Afsaneh", "Banafsheh", "Delara", "Elaheh", "Farzaneh",
    "Golnar", "Homa", "Jaleh", "Khatereh", "Parvaneh", "Touran", "Ziba",
    "Aysegul", "Bahar", "Feride", "Hacer", "Ilknur", "Nurcan", "Ozlem",
    "Rukiye", "Sevim", "Tulay", "Umran", "Vildan", "Yeliz", "Zehra",
    "Andal", "Bhuvaneswari", "Chellammal", "Dhanalakshmi", "Ezhilarasi",
    "Gomathi", "Indrani", "Jayalalitha", "Kanimozhi", "Maragatham",
    "Nagammal", "Panchali", "Rajalakshmi", "Selvi", "Thamarai", "Valli",
    "Annapurna", "Bhagyalakshmi", "Chandramukhi", "Hemalatha", "Jayasree",
    "Kanakadurga", "Lalithamma", "Manorama", "Nagalakshmi", "Padmavathi",
    "Rukmini", "Saraswathi", "Tulasi", "Vijayalakshmi", "Aparajita",
    "Bandana", "Chandana", "Debjani", "Gitanjali", "Jharna", "Kaberi",
    "Madhabi", "Nandita", "Purnima", "Tanushree", "Utpala", "Ji-hye",
    "Na-young", "Seul-gi", "Yeon-hee", "Bo-ra", "Ayako", "Chieko", "Harue",
    "Ikuko", "Kazue", "Machiko", "Nobuko", "Umeko", "Yasuko", "Endang",
    "Fitriani", "Kartini", "Murniati", "Ningsih", "Puspita", "Rahayu",
    "Sulastri", "Wahyuni", "Yuliana", "Hartini", "Divina", "Felisa",
    "Luningning", "Paz", "Bhavana", "Damayanti", "Ganga", "Hemlata",
    "Pushpa", "Urmila", "Siriwan", "Thidarat", "Waraporn", "Yupin",
    "Chanida", "Ngan", "Nhung", "Quynh", "Thu", "Tuyet", "Bich", "Dao",
    "Hue", "Hinewai", "Mereana", "Rawinia", "Tuihana", "Anahera",
    "Asenaca", "Litiana", "Mereoni", "Salote", "Torika", "Vasiti", "Malia",
    "Pualani", "Nyadeng", "Achol", "Abuk", "Ayen", "Nyibol", "Bezawit",
    "Fantaye", "Konjit", "Lemlem", "Netsanet", "Georgette", "Jamileh",
    "Layal", "Mirna", "Nuhad", "Therese", "Violette", "Yamna", "Adina",
    "Carmit", "Efrat", "Gila", "Irit", "Liora", "Merav", "Nurit", "Orly",
    "Ravit", "Vered", "Yaffa", "Zehava", "Adjoa")

  // Round-12 native-script tier: Telugu, Kannada, and Malayalam join the
  // script set (transliteration-or-unknown everywhere else), plus depth
  // in scripts already present (Tamil, Hebrew, Armenian).
  private val tranche12ScriptMale = Seq(
    "వెంకటేశ్", "రమేశ్", // Telugu
    "ರಾಜೇಶ", "ಮಂಜುನಾಥ", // Kannada
    "അരുൺ", "രാജേഷ്", // Malayalam
    "செந்தில்", // Tamil (depth)
    "נדב", "אייל", // Hebrew (depth)
    "Վահան") // Armenian (depth)

  private val tranche12ScriptFemale = Seq(
    "లక్ష్మి", "పద్మ",
    "ಲಕ್ಷ್ಮೀ", "ಗೀತಾ",
    "ലക്ഷ്മി", "ദീപ",
    "செல்வி", "வள்ளி",
    "שירה", "נעמה",
    "Լուսինե")

  /** first_name → category. Names appearing in several category lists
    * (real-data ambiguity — "Andrea" is female in most locales, male in
    * Italian) resolve by FIRST CATEGORY WINS in the concatenation order
    * below: core lists before breadth extensions, so the dominant-usage
    * category is the one listed first. The digit guard is a tripwire —
    * no real first name contains a digit, and round 7's dead
    * digit-suffixed duplicate keys must never return (round-7 verdict).
    */
  private val orderedAll: Seq[(String, String)] = (
    male.map(_ -> "male") ++ female.map(_ -> "female") ++
      mostlyMale.map(_ -> "mostly_male") ++ mostlyFemale.map(_ -> "mostly_female") ++
      andy.map(_ -> "andy") ++
      // breadth + I18N extensions LAST: core entries always win conflicts
      extMale.map(_ -> "male") ++ extFemale.map(_ -> "female") ++
      extMostlyMale.map(_ -> "mostly_male") ++
      extMostlyFemale.map(_ -> "mostly_female") ++ extAndy.map(_ -> "andy") ++
      diacriticMale.map(_ -> "male") ++ diacriticFemale.map(_ -> "female") ++
      diacriticMostlyMale.map(_ -> "mostly_male") ++
      // round-7 locale + native-script breadth, still first-category-wins
      localeMale.map(_ -> "male") ++ localeFemale.map(_ -> "female") ++
      localeMostlyMale.map(_ -> "mostly_male") ++
      localeMostlyFemale.map(_ -> "mostly_female") ++
      localeAndy.map(_ -> "andy") ++
      scriptMale.map(_ -> "male") ++ scriptFemale.map(_ -> "female") ++
      // round-8 breadth tranche, appended last (core wins conflicts)
      tranche8Male.map(_ -> "male") ++ tranche8Female.map(_ -> "female") ++
      tranche8MostlyMale.map(_ -> "mostly_male") ++
      // round-9 breadth + native-script tranche, appended last
      tranche9Male.map(_ -> "male") ++ tranche9Female.map(_ -> "female") ++
      tranche9ScriptMale.map(_ -> "male") ++
      tranche9ScriptFemale.map(_ -> "female") ++
      // round-10 breadth + native-script tranche, appended last
      tranche10Male.map(_ -> "male") ++ tranche10Female.map(_ -> "female") ++
      tranche10ScriptMale.map(_ -> "male") ++
      tranche10ScriptFemale.map(_ -> "female") ++
      // round-10 second tranche + native-script additions, appended last
      tranche10bMale.map(_ -> "male") ++ tranche10bFemale.map(_ -> "female") ++
      tranche10bScriptMale.map(_ -> "male") ++
      tranche10bScriptFemale.map(_ -> "female") ++
      // round-11 breadth + native-script tranche, appended last
      tranche11Male.map(_ -> "male") ++ tranche11Female.map(_ -> "female") ++
      tranche11ScriptMale.map(_ -> "male") ++
      tranche11ScriptFemale.map(_ -> "female") ++
      // round-12 breadth + native-script tranche, appended last
      tranche12Male.map(_ -> "male") ++ tranche12Female.map(_ -> "female") ++
      tranche12ScriptMale.map(_ -> "male") ++
      tranche12ScriptFemale.map(_ -> "female"))
    .filterNot(_._1.exists(_.isDigit))
    .map { case (k, v) => normalizeKey(k) -> v } // keys canonically composed

  val entries: Map[String, String] =
    orderedAll.foldLeft(Map.empty[String, String]) {
      case (m, (k, v)) => if (m.contains(k)) m else m.updated(k, v)
    }

  /** Canonical lookup key: NFC composition (X43 — decomposed "Jose" +
    * combining acute equals composed "José") plus removal of
    * default-ignorable code points (soft hyphen, zero-width
    * joiners/space, BOM) that copy-paste smuggles into names. CASE IS
    * PRESERVED — gender_guesser's default is case-sensitive and golden
    * profile 10 pins that behavior.
    */
  def normalizeKey(raw: String): String = {
    val nfc = java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.NFC)
    nfc.filterNot(ch => ch == '\u00AD' || // soft hyphen
      (ch >= '\u200B' && ch <= '\u200D') || // zero-width space/joiners
      ch == '\uFEFF') // BOM
  }

  /** Accent fold for DICT-SIDE aliases: NFD, strip combining marks, map
    * the non-decomposable Latin letters. Applied to dictionary keys only
    * (so plain-ASCII spellings of diacritic entries resolve — "Jose" for
    * "José" and vice versa through the native entry), never to inputs:
    * gender_guesser does not accent-strip inputs, and neither do we.
    */
  def fold(s: String): String = {
    val d = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val sb = new StringBuilder(d.length)
    d.foreach { ch =>
      if (Character.getType(ch) != Character.NON_SPACING_MARK) ch match {
        case 'ß' => sb.append("ss")
        case 'æ' => sb.append("ae"); case 'Æ' => sb.append("Ae")
        case 'ø' => sb.append('o'); case 'Ø' => sb.append('O')
        case 'đ' => sb.append('d'); case 'Đ' => sb.append('D')
        case 'ł' => sb.append('l'); case 'Ł' => sb.append('L')
        case 'œ' => sb.append("oe"); case 'Œ' => sb.append("Oe")
        case 'ı' => sb.append('i'); case 'İ' => sb.append('I')
        case c => sb.append(c)
      }
    }
    sb.toString
  }

  /** The served dictionary: exact entries plus folded aliases where the
    * folded spelling isn't already an exact entry (first category wins,
    * deterministic insertion order). Both engine tiers AND the generated
    * DuckDB oracle dict are built from this one map, so they can never
    * drift.
    */
  val resolvedEntries: Map[String, String] = {
    val aliases = orderedAll.flatMap { case (k, v) =>
      val f = fold(k); if (f != k) Some(f -> v) else None
    }
    aliases.foldLeft(entries) {
      case (m, (k, v)) => if (m.contains(k)) m else m.updated(k, v)
    }
  }

  def lookup(name: String): String =
    resolvedEntries.getOrElse(normalizeKey(name), "unknown")

  /** Deterministically ordered, for DataFrame/SQL twins. */
  val sortedEntries: Seq[(String, String)] = resolvedEntries.toSeq.sortBy(_._1)
}
