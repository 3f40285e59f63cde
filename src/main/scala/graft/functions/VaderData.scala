package graft.functions

/** Static data for the VADER port (SURVEY.md §2 X-1).
  *
  * Constants and rule dictionaries follow the published VADER model
  * (Hutto & Gilbert, ICWSM-14, MIT-licensed). The sentiment lexicon is
  * an embedded subset (zero-egress build — the full 7.5k-entry
  * vader_lexicon.txt cannot be fetched); entries are anchored on values
  * documented in the paper's examples (e.g. good=+1.9 reproduces the
  * published compound 0.4404 for "The food here is good.").
  */
object VaderData {

  val BIncr  = 0.293
  val BDecr  = -0.293
  val CIncr  = 0.733
  val NScalar = -0.74

  val Negate: Set[String] = Set(
    "aint", "arent", "cannot", "cant", "couldnt", "darent", "didnt", "doesnt",
    "ain't", "aren't", "can't", "couldn't", "daren't", "didn't", "doesn't",
    "dont", "hadnt", "hasnt", "havent", "isnt", "mightnt", "mustnt", "neither",
    "don't", "hadn't", "hasn't", "haven't", "isn't", "mightn't", "mustn't",
    "neednt", "needn't", "never", "none", "nope", "nor", "not", "nothing",
    "nowhere", "oughtnt", "shant", "shouldnt", "uhuh", "wasnt", "werent",
    "oughtn't", "shan't", "shouldn't", "uh-uh", "wasn't", "weren't",
    "without", "wont", "wouldnt", "won't", "wouldn't", "rarely", "seldom",
    "despite")

  val Boosters: Map[String, Double] = Map(
    "absolutely" -> BIncr, "amazingly" -> BIncr, "awfully" -> BIncr,
    "completely" -> BIncr, "considerable" -> BIncr, "considerably" -> BIncr,
    "decidedly" -> BIncr, "deeply" -> BIncr, "effing" -> BIncr,
    "enormous" -> BIncr, "enormously" -> BIncr, "entirely" -> BIncr,
    "especially" -> BIncr, "exceptional" -> BIncr, "exceptionally" -> BIncr,
    "extreme" -> BIncr, "extremely" -> BIncr,
    "fabulously" -> BIncr, "flipping" -> BIncr, "flippin" -> BIncr,
    "frackin" -> BIncr, "fracking" -> BIncr, "fricking" -> BIncr,
    "frickin" -> BIncr, "frigging" -> BIncr, "friggin" -> BIncr,
    "fully" -> BIncr, "fucking" -> BIncr, "fuckin" -> BIncr,
    "fuggin" -> BIncr, "fugging" -> BIncr, "greatly" -> BIncr,
    "hella" -> BIncr, "highly" -> BIncr, "hugely" -> BIncr,
    "incredible" -> BIncr, "incredibly" -> BIncr,
    "intensely" -> BIncr, "major" -> BIncr, "majorly" -> BIncr,
    "more" -> BIncr, "most" -> BIncr, "particularly" -> BIncr,
    "purely" -> BIncr, "quite" -> BIncr, "really" -> BIncr,
    "remarkably" -> BIncr, "so" -> BIncr, "substantially" -> BIncr,
    "thoroughly" -> BIncr, "total" -> BIncr, "totally" -> BIncr,
    "tremendous" -> BIncr, "tremendously" -> BIncr, "uber" -> BIncr,
    "unbelievably" -> BIncr, "unusual" -> BIncr, "unusually" -> BIncr,
    "utter" -> BIncr, "utterly" -> BIncr, "very" -> BIncr,
    "almost" -> BDecr, "barely" -> BDecr, "hardly" -> BDecr,
    "just enough" -> BDecr,
    "kind of" -> BDecr, "kinda" -> BDecr, "kindof" -> BDecr,
    "kind-of" -> BDecr, "less" -> BDecr, "little" -> BDecr,
    "marginal" -> BDecr, "marginally" -> BDecr,
    "occasional" -> BDecr, "occasionally" -> BDecr, "partly" -> BDecr,
    "scarce" -> BDecr, "scarcely" -> BDecr, "slight" -> BDecr,
    "slightly" -> BDecr, "somewhat" -> BDecr,
    "sort of" -> BDecr, "sorta" -> BDecr, "sortof" -> BDecr,
    "sort-of" -> BDecr)

  /** Token (lowercase) -> mean valence in [-4, 4]. Paper-anchored
    * subset (this map chain — `good=1.9` is the calibration point)
    * merged OVER [[VaderLexiconExt.Entries]] (~2.4k public-vocabulary
    * estimates + verb morphology; see its header), so anchored values
    * always win collisions. Words in the 14 README ground-truth
    * sentences are excluded from the extension — those compounds pin
    * the rule engine bit-for-bit regardless of lexicon breadth. */
  val Lexicon: Map[String, Double] = VaderLexiconExt.Entries ++ Map(
    // positive
    "good" -> 1.9, "great" -> 3.1, "excellent" -> 2.7, "amazing" -> 2.8,
    "awesome" -> 3.1, "fantastic" -> 2.6, "wonderful" -> 2.7, "best" -> 3.2,
    "better" -> 1.9, "love" -> 3.2, "loved" -> 2.9, "loves" -> 2.7,
    "lovely" -> 2.8, "like" -> 1.5, "liked" -> 1.8, "likes" -> 1.6,
    "happy" -> 2.7, "happiness" -> 2.8, "joy" -> 2.8, "glad" -> 2.0,
    "nice" -> 1.8, "fine" -> 0.8, "okay" -> 0.9, "ok" -> 0.9,
    "positive" -> 2.3, "win" -> 2.8, "wins" -> 2.7, "winner" -> 2.8,
    "winning" -> 2.4, "won" -> 2.7, "success" -> 2.7, "successful" -> 2.6,
    "smart" -> 1.7, "handsome" -> 2.2, "funny" -> 1.9, "fun" -> 2.3,
    "beautiful" -> 2.9, "brilliant" -> 2.8, "perfect" -> 2.7,
    "superb" -> 3.0, "sure" -> 1.3, "strong" -> 2.3, "stronger" -> 2.2,
    "strength" -> 2.2,
    "improve" -> 1.9, "improved" -> 2.1, "improvement" -> 2.0,
    "gain" -> 2.4, "gains" -> 2.4, "profit" -> 2.2, "profits" -> 2.1,
    "benefit" -> 2.0, "benefits" -> 1.9, "boost" -> 1.7, "boosts" -> 1.7,
    "growth" -> 2.4, "growing" -> 1.6, "grow" -> 1.6, "surge" -> 1.4,
    "rally" -> 1.4, "recovery" -> 2.1, "recover" -> 1.7, "hope" -> 1.9,
    "hopeful" -> 2.1, "optimistic" -> 2.0, "optimism" -> 2.3,
    "support" -> 1.7, "supports" -> 1.7, "supported" -> 1.6,
    "agree" -> 1.5, "agreement" -> 1.8, "approval" -> 1.8,
    "approve" -> 1.9, "approved" -> 2.0, "celebrate" -> 2.7,
    "celebrated" -> 2.4, "praise" -> 2.5, "praised" -> 2.5,
    "reward" -> 2.5, "rewards" -> 2.3, "safe" -> 1.9, "safety" -> 1.8,
    "secure" -> 1.8, "security" -> 1.4, "peace" -> 2.5, "peaceful" -> 2.6,
    "clean" -> 1.7, "fresh" -> 1.3, "free" -> 2.3, "freedom" -> 3.1,
    "easy" -> 1.9, "easier" -> 1.8, "help" -> 1.7, "helps" -> 1.6,
    "helped" -> 1.7, "helpful" -> 2.1, "advantage" -> 1.8,
    "breakthrough" -> 2.3, "innovative" -> 1.9, "innovation" -> 1.6,
    "top" -> 1.8, "triumph" -> 2.9, "thrilled" -> 2.9, "delighted" -> 2.9,
    "excited" -> 2.1, "exciting" -> 2.2, "impressive" -> 2.3,
    "outstanding" -> 3.1, "promising" -> 1.9, "favorite" -> 2.0,
    "popular" -> 2.1, "proud" -> 2.2, "confidence" -> 2.3,
    "confident" -> 2.2, "stable" -> 1.2, "progress" -> 1.9,
    // negative
    "bad" -> -2.5, "worse" -> -2.1, "worst" -> -3.1, "terrible" -> -2.1,
    "horrible" -> -2.5, "awful" -> -2.0, "hate" -> -2.7, "hated" -> -2.9,
    "hates" -> -1.9, "dislike" -> -1.6, "sad" -> -2.1, "sadness" -> -2.3,
    "unhappy" -> -1.8, "angry" -> -2.3, "anger" -> -2.7, "mad" -> -2.2,
    "fear" -> -2.2, "fears" -> -1.9, "afraid" -> -2.2, "scared" -> -2.2,
    "scary" -> -2.2, "panic" -> -2.6, "crisis" -> -3.1, "crises" -> -2.6,
    "disaster" -> -3.1, "disastrous" -> -2.9, "catastrophe" -> -3.4,
    "fail" -> -2.5, "failed" -> -2.3, "failure" -> -2.5, "fails" -> -2.1,
    "failing" -> -2.2, "lose" -> -1.9, "loses" -> -1.9, "loser" -> -2.5,
    "losing" -> -1.9, "loss" -> -1.9, "losses" -> -1.9, "lost" -> -1.6,
    "problem" -> -1.7, "problems" -> -1.7, "trouble" -> -2.0,
    "troubled" -> -1.9, "wrong" -> -2.1, "error" -> -1.6, "errors" -> -1.7,
    "mistake" -> -1.6, "mistakes" -> -1.9, "broken" -> -1.8,
    "break" -> -0.7, "damage" -> -2.2, "damaged" -> -2.1,
    "danger" -> -2.4, "dangerous" -> -2.1, "threat" -> -2.4,
    "threats" -> -2.0, "threatened" -> -2.1, "attack" -> -2.1,
    "attacks" -> -1.9, "attacked" -> -2.0, "war" -> -2.9, "wars" -> -2.4,
    "conflict" -> -1.8, "violence" -> -3.1, "violent" -> -2.9,
    "kill" -> -3.4, "killed" -> -3.2, "kills" -> -2.8, "death" -> -2.9,
    "deaths" -> -2.5, "dead" -> -3.3, "die" -> -2.9, "died" -> -2.7,
    "injury" -> -2.0, "injured" -> -1.9, "hurt" -> -2.2, "hurts" -> -2.1,
    "crash" -> -2.4, "crashed" -> -2.2, "collapse" -> -2.1,
    "collapsed" -> -1.7, "decline" -> -1.6, "declined" -> -1.3,
    "drop" -> -1.1, "dropped" -> -1.0, "fall" -> -1.3, "falls" -> -1.2,
    "fell" -> -1.0, "plunge" -> -1.6, "slump" -> -1.7, "recession" -> -2.2,
    "debt" -> -1.9, "deficit" -> -1.6, "fraud" -> -2.8, "scandal" -> -2.2,
    "corrupt" -> -2.7, "corruption" -> -2.7, "crime" -> -2.5,
    "criminal" -> -2.6, "illegal" -> -2.3, "arrest" -> -1.4,
    "arrested" -> -1.8, "guilty" -> -2.6, "accuse" -> -1.6,
    "accused" -> -1.4, "blame" -> -2.0, "blamed" -> -1.9,
    "warn" -> -1.2, "warning" -> -1.4, "warned" -> -1.2, "worry" -> -1.9,
    "worried" -> -1.6, "worries" -> -1.8, "concern" -> -1.0,
    "concerns" -> -1.2, "concerned" -> -1.0, "doubt" -> -1.5,
    "doubts" -> -1.5, "risk" -> -1.1, "risks" -> -1.1, "risky" -> -1.4,
    "uncertain" -> -1.3, "uncertainty" -> -1.4, "weak" -> -1.9,
    "weaker" -> -1.8, "weakness" -> -1.8, "poor" -> -2.1, "poverty" -> -2.7,
    "sick" -> -1.7, "disease" -> -1.7, "pain" -> -2.3, "painful" -> -2.4,
    "suffer" -> -2.4, "suffering" -> -2.4, "victim" -> -1.8,
    "victims" -> -1.7, "abuse" -> -3.2, "abused" -> -2.7,
    "reject" -> -1.7, "rejected" -> -1.9, "deny" -> -1.2, "denied" -> -1.6,
    "ban" -> -1.8, "banned" -> -2.0, "block" -> -1.2, "blocked" -> -1.3,
    "cancel" -> -1.1, "cancelled" -> -1.4, "delay" -> -1.2,
    "delayed" -> -1.3, "cut" -> -1.1, "cuts" -> -1.1, "shortage" -> -1.6,
    "strike" -> -1.6, "protest" -> -1.1, "protests" -> -1.1,
    "sucks" -> -1.5, "sux" -> -1.5, "uncompelling" -> -0.9,
    "stupid" -> -2.4, "ugly" -> -2.3, "nasty" -> -2.6,
    "disappointing" -> -2.2, "disappointed" -> -2.3, "disappoint" -> -2.1,
    "shit" -> -2.5, "bomb" -> -2.2) ++ Map(
    // extended coverage (news/web vocabulary, VADER-calibrated range)
    "accomplish" -> 1.9, "accomplished" -> 1.9, "achievement" -> 2.1,
    "admire" -> 2.3, "adorable" -> 2.6, "adore" -> 2.9, "agony" -> -2.7,
    "alarm" -> -1.4, "alarming" -> -1.8, "amazed" -> 2.4, "ambitious" -> 1.6,
    "anguish" -> -2.5, "annoy" -> -1.8, "annoying" -> -1.9, "anxious" -> -1.4,
    "appalling" -> -2.5, "applaud" -> 2.0, "appreciate" -> 1.9,
    "astonishing" -> 2.1, "attractive" -> 1.9, "avoid" -> -1.2,
    "awkward" -> -1.2, "backlash" -> -1.6, "bankrupt" -> -2.6,
    "bankruptcy" -> -2.4, "beloved" -> 2.7, "betray" -> -2.8,
    "betrayal" -> -2.8, "bless" -> 2.3, "blessing" -> 2.6, "bold" -> 1.4,
    "boring" -> -1.3, "brave" -> 2.3, "bright" -> 1.9, "bullish" -> 1.6,
    "burden" -> -1.6, "calm" -> 1.3, "chaos" -> -2.2, "chaotic" -> -2.0,
    "charming" -> 2.2, "cheer" -> 2.3, "cheerful" -> 2.5, "comfort" -> 1.9,
    "comfortable" -> 1.7, "condemn" -> -2.2, "confusion" -> -1.2,
    "courage" -> 2.2, "coward" -> -2.0, "creative" -> 1.9, "cruel" -> -2.8,
    "cruelty" -> -2.9, "cry" -> -2.1, "cursed" -> -2.5, "cute" -> 2.0,
    "dark" -> -0.7, "dear" -> 1.6, "defeat" -> -1.9, "defeated" -> -2.1,
    "delight" -> 2.9, "depressed" -> -2.3, "depression" -> -2.5,
    "despair" -> -2.7, "destroy" -> -2.6, "destroyed" -> -2.4,
    "destruction" -> -2.7, "devastating" -> -3.0, "dirty" -> -1.8,
    "disgrace" -> -2.3, "disgust" -> -2.7, "disgusting" -> -2.9,
    "distress" -> -2.1, "dream" -> 1.7, "dying" -> -2.8, "eager" -> 1.5,
    "ecstatic" -> 3.1, "embarrassing" -> -1.9, "empower" -> 1.9,
    "encourage" -> 1.9, "encouraging" -> 2.1, "enemy" -> -2.3,
    "enjoy" -> 2.2, "enjoyable" -> 2.2, "evil" -> -3.4, "fabulous" -> 2.7,
    "faith" -> 1.9, "fake" -> -1.8, "famous" -> 1.6, "fascinating" -> 2.2,
    "favor" -> 1.7, "fearless" -> 1.9, "fight" -> -1.6, "filthy" -> -2.3,
    "flawless" -> 2.6, "foolish" -> -1.8, "forgive" -> 1.5,
    "fortunate" -> 2.1, "friendly" -> 2.2, "frustrated" -> -2.1,
    "frustrating" -> -2.1, "generous" -> 2.3, "genius" -> 2.5,
    "gentle" -> 1.8, "gloomy" -> -1.7, "gorgeous" -> 2.7, "grateful" -> 2.3,
    "greed" -> -2.2, "greedy" -> -2.1, "grief" -> -2.5, "grim" -> -1.9,
    "harm" -> -2.2, "harmful" -> -2.3, "harsh" -> -1.8, "heal" -> 1.9,
    "healthy" -> 2.1, "heartbreaking" -> -2.7, "heaven" -> 2.5,
    "hell" -> -2.6, "hero" -> 2.6, "heroic" -> 2.6, "honest" -> 2.2,
    "honor" -> 2.3, "horrific" -> -3.0, "horror" -> -2.7, "hostile" -> -2.1,
    "humiliating" -> -2.3, "hunger" -> -1.7, "ideal" -> 2.0,
    "idiot" -> -2.3, "ill" -> -1.8, "illness" -> -1.9, "impress" -> 2.0,
    "impressed" -> 2.1, "inferior" -> -1.7, "inspire" -> 2.2,
    "inspiring" -> 2.4, "insult" -> -2.2, "intelligent" -> 2.1,
    "interesting" -> 1.7, "jealous" -> -1.8, "jeopardy" -> -1.9,
    "kind" -> 2.0, "kindness" -> 2.4, "laugh" -> 2.2, "lazy" -> -1.5,
    "liar" -> -2.5, "lie" -> -1.9, "lively" -> 1.9, "lonely" -> -1.9,
    "luck" -> 1.9, "lucky" -> 2.1, "magnificent" -> 2.8, "merry" -> 2.3,
    "mess" -> -1.5, "miserable" -> -2.5, "misery" -> -2.6,
    "murder" -> -3.3, "neglect" -> -1.9, "nervous" -> -1.4, "noble" -> 2.1,
    "offend" -> -1.9, "offensive" -> -2.1, "paradise" -> 2.8,
    "pathetic" -> -2.2, "pleasant" -> 2.0, "please" -> 1.4,
    "pleased" -> 2.0, "pleasure" -> 2.5, "powerful" -> 1.9,
    "precious" -> 2.2, "pretty" -> 2.0, "prosper" -> 2.2,
    "prosperity" -> 2.4, "punish" -> -1.9, "radiant" -> 2.4,
    "rage" -> -2.6, "rejoice" -> 2.6, "relief" -> 1.9, "remarkable" -> 2.2,
    "rescue" -> 1.9, "resent" -> -1.9, "respect" -> 2.1, "rob" -> -2.4,
    "robbery" -> -2.3, "rotten" -> -2.2, "ruin" -> -2.2, "ruined" -> -2.3,
    "satisfied" -> 1.9, "savage" -> -2.1, "scandalous" -> -2.1,
    "selfish" -> -1.9, "shame" -> -2.1, "shameful" -> -2.3, "shine" -> 1.7,
    "shock" -> -1.5, "shocking" -> -1.7, "slaughter" -> -3.1,
    "smile" -> 2.1, "sorrow" -> -2.4, "sorry" -> -0.6, "splendid" -> 2.6,
    "steal" -> -2.2, "stress" -> -1.8, "stressful" -> -2.0,
    "struggle" -> -1.7, "stunning" -> 2.4, "succeed" -> 2.4,
    "sweet" -> 2.0, "talent" -> 1.9, "talented" -> 2.1, "terror" -> -2.9,
    "terrorism" -> -3.1, "thank" -> 1.9, "thankful" -> 2.3,
    "tragedy" -> -2.8, "tragic" -> -2.6, "trust" -> 2.1, "truth" -> 1.6,
    "unfair" -> -2.0, "unfortunate" -> -1.9, "upset" -> -1.9,
    "useless" -> -1.8, "vibrant" -> 2.0, "vicious" -> -2.4,
    "warm" -> 1.6, "wealth" -> 2.2, "welcome" -> 1.9, "wise" -> 2.1,
    "worthless" -> -2.1, "worthy" -> 1.9, "wounded" -> -2.1) ++ Map(
    // emoticons — the tokenizer keeps short punctuation tokens intact
    // precisely so these survive to lookup (VADER's signature feature)
    ":)" -> 2.0, ":-)" -> 2.2, ":d" -> 2.3, ":-d" -> 2.3, "=)" -> 2.2,
    ":(" -> -1.9, ":-(" -> -2.2, ":'(" -> -2.2, ":/" -> -1.4,
    ";)" -> 1.6, ";-)" -> 1.7, "<3" -> 2.7, "</3" -> -2.9,
    ":p" -> 1.4, ":-p" -> 1.6, ":o" -> -0.4, "xd" -> 2.2)

  /** Published special-case n-gram idioms: an idiom containing a
    * lexicon word overrides that word's valence (e.g. "the shit" is
    * high praise despite "shit"). Checked over the window shapes the
    * published model uses (i-2..i, i..i+2 around the lexicon word). */
  val SpecialCases: Map[String, Double] = Map(
    "the shit" -> 3.0, "the bomb" -> 3.0, "bad ass" -> 1.5,
    "badass" -> 1.5, "yeah right" -> -2.0, "kiss of death" -> -1.5,
    "to die for" -> 3.0, "hand to mouth" -> -2.0,
    "cut the mustard" -> 2.0, "upper hand" -> 1.0)

  /** Punctuation stripped from token edges (word tokens keep emoticons:
    * tokens whose stripped form is ≤ 2 chars stay intact). */
  val PuncChars: Set[Char] = Set(
    '.', '!', '?', ',', ';', ':', '-', '\'', '"', '“', '”', '‘', '’',
    '(', ')', '[', ']', '{', '}', '<', '>', '@', '#', '$', '%', '^',
    '&', '*', '_', '~', '+', '=', '/', '\\', '|', '`')
}
