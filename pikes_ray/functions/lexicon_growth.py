"""Programmatic lexicon growth from PUBLIC word lists (VERDICT r2 top
item (b)): open-vocabulary coverage beyond the pinned core lexicon.

The reference loads the full PropBank/NomBank framesets, full WordNet
and a live Spotlight linker (AnnotationPipeline.java:124-166,
Defaults.java:88-91; getDependencies.sh fetches the model pack) — none
of those binary resources exist in this container.  What IS public
knowledge is the *shape* of those resources:

- PropBank roleset ids are ``<lemma>.<nn>`` and for the large majority
  of verbs the OntoNotes most-frequent sense is ``.01`` (the
  reference's E5 frequency disambiguation picks exactly that argmax);
  a small exception map pins well-known non-``.01`` dominants.
- NomBank's deverbal nominals follow productive derivational
  morphology (-ment/-tion/-al/-ance/-er/…) with the noun's roleset
  mapping onto the source verb's PropBank roleset
  (resources/NomBank.java getPBId).  We generate the noun table
  FORWARD from the verb list — overgenerated non-words are harmless
  (they never occur in text) — plus an irregular-nominalization map.
- Entity linking degrades to shape-based NER with a public gazetteer
  of country names (whose DBpedia resource IS the underscored name)
  and common given names for PERSON typing.

Everything here is deterministic, versioned with the code, and merged
into the live lexicon at LOWEST precedence (the pinned core and, when
present, the eval-pm entries always win) — see
``pikes_ray.functions.lexicon.set_profile``.
"""

from __future__ import annotations

from functools import lru_cache

# ---------------------------------------------------------------------------
# verbs: ~2,200 frequent English lemmas (public frequency lists; two
# tranches — round 3's ~700 plus round 4's top-frequency completion),
# PropBank roleset = lemma.01 unless the exception map says otherwise
# ---------------------------------------------------------------------------

# dominant senses that are publicly documented as non-.01 in the
# public PropBank frame files / OntoNotes sense distributions (the
# reference's E5 frequency disambiguation takes the same argmax —
# resources/FrequencyDisambiguation semantics); one sense per lemma,
# exactly like the reference's per-lemma most-frequent-sense pick
# NOTE (VERDICT r4 item 1b): every non-.01 pin whose lemma belongs to
# the eval-pm gold vocabulary (pose.02, mount.02, storm.02, prompt.02,
# push.02, spin.02, run.05, make.02, have.03) lives in the QUARANTINED
# lexicon.EVAL_PM_VERB_FRAMES table, not here — the growth layer must
# stay provably gold-disjoint (tests/test_lexicon_growth.py enforces
# zero key overlap with the EVAL_PM tables).
VERB_SENSE_EXCEPTIONS: dict[str, str] = {
    "leave": "leave.01", "keep": "keep.01",
    # "sign an agreement" (affix signature) over signal
    "sign": "sign.02",
    # "give back" over go-back for transitive return
    "return": "return.02",
}

COMMON_VERBS = """
accept access accompany accomplish accuse achieve acknowledge act adapt add
address adjust admit adopt advance advise affect afford aid aim alert allege
allocate allow alter analyze answer anticipate apologize appeal appear apply
appoint appreciate argue arise arrange arrest arrive ask assault assemble
assert assess assign assist assume assure attach attack attempt attend
attribute audit authorize avoid award back bake balance ban bar base battle
bear beat begin behave believe belong benefit bet bid bind blame blast blend
block blow board boast boil bomb book boost borrow bother bounce brand break
breathe breed brief bring broadcast build burn burst bury call calm campaign
cancel care carry carve cast catch cause cease celebrate certify chair change
charge chase chat cheat check cheer choose cite claim clarify classify clean
clear climb cling coach collapse collect combat combine come command comment
commit communicate compare compel compensate compete compile complain
complete comply compose compromise compute conceal concede conceive
concentrate concern conclude condemn conduct confess configure confirm
confront connect conserve consider consist consolidate constitute construct
consult consume contact contain contemplate contend contest continue contract
contrast control convene convert convey convict convince cook cooperate
coordinate cope copy correct correspond cost counsel count counter cover
crack craft crash create credit criticize cross crush cry cultivate cure cut
damage dance dare debate decide declare decline decorate decrease dedicate
deem default defeat defend define defy delay delegate delete demand
demonstrate deny depart depend depict deploy deposit deprive derive descend
describe deserve design designate desire destroy detail detain detect
determine develop devise devote diagnose dictate die differ dig diminish dip
direct disagree disappear discard discharge disclose discount discourage
discover discuss dismiss display dispute disrupt dissolve distinguish
distribute disturb dive divert divide document dominate double doubt draft
drag drain draw dream dress drift drill drink drive drop drown dump earn ease
eat echo edit educate elect elevate eliminate embrace emerge emphasize employ
enable enact encounter encourage end endorse endure enforce engage enhance
enjoy enlist enroll ensure enter entertain escape establish estimate evaluate
evolve examine exceed exchange exclude excuse execute exercise exert exhibit
exist expand expect expel experience explain explode exploit explore export
expose express extend extract face facilitate fail favor fear feature feed
feel file fill film finance find fine finish fire fit fix flee float flood
focus fold follow forbid force forecast forge forget forgive form formulate
foster frame free freeze frustrate fuel fulfill function fund gain gain
generate get glance grab grant grasp greet grieve grip guarantee guard guess
guide halt hand handle hang happen harm harvest hate haul head heal hear heat
hesitate hide highlight hint hit hold honor host house hunt hurt identify
ignite ignore illustrate imagine implement imply import improve include
incorporate increase incur indicate induce indulge infect inflict influence
inform initiate inject injure insert insist inspect inspire install insult
insure integrate intend intercept interfere interpret interrupt intervene
interview introduce invade invent investigate invite involve issue join
judge jump justify keep kick kidnap kill kiss knock know label lack land
last laugh lay learn leave lend let level license lie lift light like limit
link list listen live load locate lock log look lose love lower maintain
manage mandate manipulate manufacture march mark market marry master match
matter mean measure mediate melt mention merge migrate mind mingle minimize
miss mix mobilize modify monitor motivate move multiply name narrow need
negotiate nominate note notice notify obey object oblige observe obtain
occupy occur offer offset omit operate order oust outline overcome oversee
overturn owe own pack paint park participate pass pause pay perceive perform
permit persist persuade phase pick picture pile pilot pin place play plead
pledge plot plunge point pollute portray position possess post postpone pour
praise pray preach precede predict prefer prepare prescribe present preserve
preside press presume pretend prevail print probe proceed process proclaim
produce profit program progress prohibit project promise promote pronounce
propose prosecute protect protest prove provide provoke publish pull punish
purchase pursue qualify question quit quote race raid raise rally range rank
rate reach react read realize reassure rebuild recall receive recite
recognize recommend reconcile reconsider record recount recover recruit
reduce refer refine reflect reform refuse regain regard register regret
regulate reinforce reiterate relate relax release relieve rely remain remark
remember remind remove render renew rent repair repeat replace reply
represent request require rescue research resemble reserve reside resign
resist resolve respect respond restore restrict restructure result resume
retain retire retreat retrieve reveal reverse review revise revive reward
ride ring rip risk roll rule rush sail satisfy save scan scare schedule
score scramble scrap scream screen seal search seat secure see seek seem
seize select send separate serve set settle shake shape share shed shift
shine ship shock shoot shop shout show shrink shut sing sink sit situate
ski skip slam sleep slide slip slow smash smell smile smoke snap soar solve
sort sound span spark speak specialize specify speculate spend spill split
sponsor spot spread spur stabilize stage stand stare start starve state
station stay steal steer stem step stick stimulate stir stop store strengthen
stress stretch strike strip strive struggle study stun submit subscribe
subsidize substitute succumb sue suffer suggest suit summon supervise supply
suppose suppress surge surrender surround survey survive suspect suspend
sustain swear sweep swim swing switch tackle take talk target teach tear
tell tend terminate test testify thank think threaten thrive throw tie
tighten tolerate top toss total touch tour trace track trade train transfer
transform translate transmit transport trap travel treat trigger trim triple
trust turn undergo undermine understand undertake unfold unify unite unveil
update upgrade uphold urge use utilize value vary verify veto view violate
vote vow wait wake walk wander warn wash waste watch wave weaken wear weigh
welcome widen win wind wish withdraw withstand witness wonder worry wound
wrap write yield
""".split()

# second public-frequency tranche (round 4, re-scoped round 5): the
# everyday top-frequency verbs the first tranche omitted plus the long
# tail of a public ~2000-lemma frequency list.  PropBank roleset =
# lemma.01 unless VERB_SENSE_EXCEPTIONS pins the documented dominant.
# Lemmas that belong to the eval-pm gold vocabulary (say, want,
# become, pose, blacklist, …) were REMOVED from this tranche in round
# 5 (VERDICT r4 item 1b): they live in the quarantined
# lexicon.EVAL_PM_VERB_FRAMES table, and the ablated profiles reach
# them only through the open-vocabulary lemma.01 fallback.
COMMON_VERBS += """
tell need get go take do put grow
abandon absorb abuse accelerate accommodate accumulate advocate amend
amuse anchor annex annoy approach arm assassinate astonish attain avert
bargain beg bend bestow betray bite bleed bless blink bolster bombard
bow breach broker browse brush buckle bully bump burden calibrate camp
carve cater caution cede chant charm chart chew choke chop chronicle
churn circle circulate circumvent clamp clap clash claw cleanse clench
click clinch clog clutch coax coerce coincide collide collude comfort
commemorate commend commission commute condone confer confide confine
confiscate conform confound congratulate conquer consent conspire
constrain contaminate contradict converge converse cooperate correlate
counteract couple court crave crawl creep cripple crouch crowd cruise
crumble crusade cull curb curl curse curtail dampen dangle dart dash
dazzle decay decelerate decipher decode decompose decree deduce deduct
defame defect defer deflate deflect defraud defuse degrade delight
delve demean demolish demote denounce dent depreciate derail deride
desert despise detach deteriorate dethrone detonate devalue devastate
deviate devour dictate differentiate diffuse digest dilute dine discern
disconnect discredit disdain disembark disengage disguise disgust
dishonor disintegrate dislike dislodge dismantle dismay disobey disown
dispatch dispel dispense disperse displace dispose disprove disqualify
disregard dissent dissipate dissuade distill distort distract distress
diverge diversify divulge dodge doom douse downgrade download draft
drape dread dredge drench drip dwell dwindle earmark eavesdrop eclipse
edge eject elaborate elapse electrify elude emanate embark embed
embezzle embody embolden emit empower emulate encircle enclose encode
encompass endanger energize engineer engrave engulf enlarge enlighten
enrage enrich ensue entail entangle entice entrench entrust envision
equate equip eradicate erect erode erupt escalate eschew escort espouse
evacuate evade evaporate evict evoke exacerbate exaggerate excavate
excel exclaim exemplify exhale exhaust exile exonerate expedite expire
expound expunge extinguish extol extort extradite exude fabricate
falter fancy fascinate fathom fatten feast feign fend ferry fester
fetch flank flare flatten flatter flaunt flicker fling flip flirt flock
flourish flout fluctuate flush foil forage foresee foreshadow forfeit
forgo formalize fortify forward fracture fray frequent fret frighten
frown fumble furnish fuse galvanize gamble garner gasp gauge gaze
gesture glare glean glide glimpse gloat glorify glow gnaw goad gossip
grapple gravitate graze grin grind groan groom grope growl grumble
grunt gush halve hamper harass harbor harden harmonize harness hasten
hatch haunt heave hedge heed herald herd hijack hinder hoard hobble
hoist hook hop horrify hospitalize hover howl huddle hug hum humiliate
hurl hustle idealize idle immerse immigrate immobilize immunize impair
impart impeach impede impersonate implant implicate implode implore
improvise incite incline infer infest infiltrate inflame inflate
infringe infuriate ingest inhabit inhale inhibit insinuate instigate
instill institute instruct insulate intensify interact intercede
interject interlock intern interrogate intersect intertwine intimidate
intrigue inundate invalidate invert invigorate invoke irritate jail
jam jeer jeopardize jerk jog jolt jostle juggle kneel knit lag lament
languish lash latch laud leak lean leap lecture legalize legislate
legitimize lessen liberate lick linger liquidate litigate litter loathe
lobby lodge loom loot lull lunge lurch lure lurk magnify maim malign
maneuver manifest marvel mask masquerade massacre massage materialize
maximize meander meddle memorize menace mend mentor mesh mesmerize
mimic mislead mismanage misplace misread misrepresent mistake mistreat
mistrust misunderstand misuse mitigate moan mock moderate modernize
mold mollify monopolize moor mop morph mortgage mourn mow muddle
muffle mull mumble murder murmur muse muster mutate mute mutilate
mutter mystify nag nail narrate navigate neglect nestle nibble nickname
nod normalize nudge nullify nurse nurture obscure obsess obstruct
offend officiate ooze orbit orchestrate ordain orient originate
ostracize outbid outdo outgrow outlast outlaw outnumber outpace
outperform outrage outrun outshine outsmart outsource outweigh
overburden overcharge overdo overdose overestimate overflow overhaul
overhear overheat overlap overload overlook overpower overreact
override overrule overrun overshadow overstate overstep overtake
overthrow overuse overwhelm overwork pacify pamper parade paralyze
paraphrase pardon pare parody partake partition pat patch patent patrol
patronize pave pawn peck peddle peek peel peer penalize penetrate perch
perfect perish perk permeate perpetrate perpetuate persecute personify
pertain perturb peruse pester petition phrase picket pierce pinch
pinpoint pioneer pique pitch pity pivot placate plagiarize plague plant
plaster plow pluck plummet plunder ply poach pocket poison poke
polarize polish ponder pool pop popularize populate pound pout preclude
predate preempt preoccupy prescribe presuppose prey prick privatize
prod profess proliferate prolong propel prosper protrude prowl prune
pry publicize pump punch puncture purge purify quadruple quake quantify
quarantine quarrel quash quell quench quibble quicken quiver radiate
rage rain rake ram ramble rampage ransack rant rap rape ration rattle
ravage rave raze rebound rebuff rebuke rebut recant recapture recede
recharge reckon reclaim recline recoil reconstruct recreate rectify
recuperate recur recycle redeem redirect rediscover redo redouble
redraw reel reenact refurbish regress rehabilitate rehearse reign
reimburse rein reinstate reinvent rejoice rejoin rejuvenate rekindle
relapse relay relegate relent relinquish relish relocate remarry remedy
reminisce remit remodel renounce renovate repatriate repay repeal repel
repent rephrase replenish replicate repossess reprimand reproach
reproduce repudiate resent reshape reshuffle resonate resound resurface
resurrect resuscitate retaliate retort retract retrace revamp revel
reverberate revere revert revitalize revoke revolt revolutionize
revolve rewrite ricochet rid riddle ridicule rig rile rinse riot ripen
ripple rival roam roar roast rob rock romanticize root rot rotate rouse
rout rove rub ruffle rumble ruminate rummage rupture rust rustle
sabotage sack sacrifice sadden saddle sag salvage sanction sanctify
sanitize sap saturate savor scald scale scatter scavenge scoff scold
scoop scorch scorn scour scout scowl scrape scratch scrawl scribble
scrub scrutinize sculpt scurry seclude seduce seep seethe segregate
sentence sequester sever sew shackle shade shadow shatter shave shear
shelter shepherd shield shimmer shiver shove shovel showcase shred
shriek shrivel shrug shudder shuffle shun shuttle sidestep sideline
sigh signify silence simmer simplify simulate sin sip siphon sketch
skew skid skim skimp skirmish skirt skyrocket slander slant slap slash
slaughter slay slice slither slog slouch slump slur smack smear smirk
smother smuggle snarl snatch sneak sneer sneeze snicker sniff snip
snoop snooze snore snort snub soak sob socialize soften soil solicit
solidify soothe sour sow spare sparkle spawn spearhead spew spice spike
spiral spit splash splinter splurge spoil spout sprawl spray sprinkle
sprint sprout spurn sputter spy squabble squander squash squat squeak
squeal squeeze squint squirm squirt stab stack stagger stagnate stain
stake stalk stall stammer stamp stampede standardize startle stash
steady steam steep sterilize stifle stigmatize sting stink stipulate
stitch stockpile stoke stomp stoop straddle strafe straighten strain
strand strangle stray streak stream streamline stride strut stumble
stump stutter subdue subjugate sublet submerge subordinate subpoena
subside substantiate subtract subvert suck suffocate sulk summarize
supplant supplement surmise surmount surpass swagger swallow swamp swap
swarm swat sway swell swerve swindle swirl swoop symbolize sympathize
synchronize synthesize taint tamper tangle tantalize tap taper tarnish
taunt tax teem televise temper tempt terrify terrorize tether thaw
theorize thicken thin thrash thread thrill throb throttle thrust thud
thump thwart tick tickle tilt tinker tiptoe tire toast toil topple
torment torpedo torture tout tow tower toy trample transcend transcribe
transplant traumatize traverse tread treasure trek tremble trespass
trickle trip triumph trivialize trot trounce truncate tuck tug tumble
tune tunnel tutor twinkle twirl twist twitch typify unbuckle uncover
underestimate underline underpin underscore understate undo undress
unearth unfasten unfurl unleash unlock unmask unnerve unpack unravel
unseat unsettle untangle untie unwind unwrap uproot upset upstage usurp
utter vacate vaccinate vacillate validate vandalize vanish vanquish
vaporize vault veer venerate vent ventilate venture verbalize vest vex
vibrate victimize vie vilify vindicate visualize vocalize voice void
volunteer vomit vouch wade waft wag wager wail waive wallow wander warp
wean weather weave wed weep weld whack whimper whine whip whirl whisk
whisper whistle wield wiggle wilt wince wink wipe wire wither wobble
woo worsen wreak wreck wrench wrestle wriggle wring wrinkle yank yawn
yearn yell yelp zigzag zoom
""".split()
# dedupe while preserving first occurrence (rolesets are per-lemma, so
# duplicates are harmless but wasteful)
COMMON_VERBS = list(dict.fromkeys(COMMON_VERBS))

# agentive nominalization suffix → self-filled A0 (the fighter IS the
# one fighting); process/result nominalizations default to an optional
# A1 (the created/affected thing may be the noun itself)
_AGENTIVE = ("er", "or")


@lru_cache(maxsize=None)
def grown_verb_frames() -> dict[str, str]:
    """lemma → PropBank roleset id for the grown verb vocabulary."""
    out = {v: VERB_SENSE_EXCEPTIONS.get(v, f"{v}.01") for v in COMMON_VERBS}
    return out


def _nominal_candidates(verb: str) -> list[tuple[str, str]]:
    """(noun surface, kind) deverbal nominalizations generated FORWARD
    from one verb lemma; non-words are harmless overgeneration."""
    stem = verb[:-1] if verb.endswith("e") else verb
    out = [
        (verb + "ment", "result"),            # govern → government
        (stem + "al", "result"),              # approve → approval
        (stem + "ation", "result"),           # organize → organization
        (verb + "ion" if verb.endswith("t") else stem + "ion", "result"),
        (stem + "ance", "result"),            # accept → acceptance
        (stem + "ence", "result"),            # insist → insistence
        (stem + "er", "agent"),               # lead → leader
        (stem + "or", "agent"),               # invest → investor
    ]
    # CVC doubling for -er (run → runner)
    if (len(verb) >= 3 and verb[-1] not in "aeiouwxy"
            and verb[-2] in "aeiou" and verb[-3] not in "aeiou"):
        out.append((verb + verb[-1] + "er", "agent"))
    return out


# zero-derivation nominals: the noun surface IS the verb lemma and the
# NomBank roleset shares the verb's PropBank structure ("a stark
# challenge" → challenge.01; NomBank annotates these as ordinary
# deverbal entries).  Curated — NOT generated for every verb, because
# many noun homographs are unrelated senses (storm = weather, run =
# cricket, spring = season).
ZERO_NOMINALS = """
attack plan deal demand claim protest fight talk visit offer bid
promise attempt challenge vote march increase decrease decline drop
push support struggle strike vow pledge ban veto boycott raid search
review answer reply call change start aid appeal arrest audit award
balance blame campaign cause charge cost debate defeat delay desire
dispute escape estimate fear focus gain guarantee hope lack love pause
praise purchase reform release rescue risk rule smell surge trade
transfer trust wish worry profit
""".split()

# irregular nominalizations whose stem rules don't reach the verb
NOMINALIZATION_IRREGULAR: dict[str, str] = {
    "opposition": "oppose", "success": "succeed", "discussion": "discuss",
    "persuasion": "persuade", "invasion": "invade", "conversion": "convert",
    "perception": "perceive", "intervention": "intervene",
    "prevention": "prevent", "intention": "intend", "detention": "detain",
    "suspension": "suspend", "behavior": "behave", "marriage": "marry",
    "storage": "store", "usage": "use", "passage": "pass",
    "coverage": "cover", "delivery": "deliver", "discovery": "discover",
    "recovery": "recover", "robbery": "rob", "entry": "enter",
    "injury": "injure", "complaint": "complain", "merger": "merge",
    "dismissal": "dismiss", "proposal": "propose", "removal": "remove",
    "withdrawal": "withdraw", "betrayal": "betray", "renewal": "renew",
    "revival": "revive", "relief": "relieve", "gift": "give",
    "argument": "argue",
    "decision": "decide", "description": "describe", "destruction": "destroy",
    "expansion": "expand", "extension": "extend", "explosion": "explode",
    "division": "divide", "provision": "provide", "collision": "collide",
    "conclusion": "conclude", "exclusion": "exclude", "inclusion": "include",
    "permission": "permit", "admission": "admit", "submission": "submit",
    "transmission": "transmit", "production": "produce",
    "introduction": "introduce", "reduction": "reduce",
    "assumption": "assume", "consumption": "consume",
    "resolution": "resolve", "solution": "solve", "pursuit": "pursue",
    "receipt": "receive", "reception": "receive", "response": "respond",
    "defense": "defend", "offense": "offend", "pressure": "press",
    "failure": "fail", "departure": "depart", "seizure": "seize",
    "closure": "close", "exposure": "expose", "survival": "survive",
    "arrival": "arrive", "denial": "deny", "refusal": "refuse",
    "burial": "bury", "trial": "try", "loss": "lose", "speech": "speak",
    "thought": "think", "flight": "fly", "growth": "grow", "death": "die",
    "belief": "believe", "proof": "prove", "choice": "choose",
    "sale": "sell", "theft": "steal",
}


# agentive nominals the -er/-or stem rules cannot reach (donor IS the
# donate.01 A0 — NomBank incorporated-argument semantics)
IRREGULAR_AGENTIVE: dict[str, str] = {
    "donor": "donate", "applicant": "apply", "defendant": "defend",
    "assistant": "assist", "participant": "participate",
    "occupant": "occupy", "servant": "serve", "consultant": "consult",
    "immigrant": "immigrate", "attendant": "attend",
    "contestant": "contest", "informant": "inform",
    "competitor": "compete", "analyst": "analyze",
}

# patientive -ee nominals: the noun incorporates the verb's A1 (the
# employee IS the one employed)
IRREGULAR_PATIENTIVE: dict[str, str] = {
    "employee": "employ", "appointee": "appoint", "detainee": "detain",
    "nominee": "nominate", "trainee": "train", "devotee": "devote",
}

# common words the forward rules would wrongly analyze as deverbal
# nominals (letter ≠ one who lets); never emit these
NOMINALIZATION_BLOCKLIST = frozenset({
    "better", "letter", "signal", "closer", "matter", "winter", "summer",
    "corner", "chapter", "quarter", "formal", "normal", "mission",
    "station", "nation", "fashion", "caption", "section", "carrion",
    "professor", "razor", "rigor", "banner", "charter", "department",
})

# NomBank-shaped curated common nouns (public NomBank 1.0 lexicon
# facts; resources/NomBank.java morphs/rolesets): noun lemma →
# (NomBank roleset, PropBank counterpart or "", mandatory self-args,
# optional self-args).  Self-arg semantics follow NomBank's
# incorporated-argument annotation: a title noun IS its A0 leader and
# optionally takes the governed body as A2 ("Syria president"); a
# relational noun IS its A0 and takes the alter as A1 ("our brothers");
# group nouns carry a plain roleset (their modifiers fill A1/A3).
COMMON_NOUNS: dict[str, tuple[str, str, tuple[int, ...], tuple[int, ...]]] = {
    # NOTE (VERDICT r4 item 1b): rows duplicating a key of the
    # quarantined lexicon.EVAL_PM_NOUN_FRAMES table (president,
    # official, veteran, insurgent, brother, group, force, …) were
    # removed in round 5 — gold-register vocabulary lives only in the
    # quarantined layer, and tests enforce zero key overlap.
    # office / title nouns (a0 self, a2 = governed entity)
    "minister":   ("minister.01", "", (0,), (2,)),
    "chairman":   ("chairman.01", "", (0,), (2,)),
    "chancellor": ("chancellor.01", "", (0,), (2,)),
    "mayor":      ("mayor.01", "", (0,), (2,)),
    "senator":    ("senator.01", "", (0,), (2,)),
    "secretary":  ("secretary.01", "", (0,), (2,)),
    "spokesman":  ("spokesman.01", "", (0,), (2,)),
    "chief":      ("chief.01", "", (0,), (2,)),
    "expert":     ("expert.01", "", (0,), (2,)),
    "deputy":     ("deputy.01", "", (0,), (2,)),
    "head":       ("head.03", "", (0,), (2,)),
    # plain agentive nouns (a0 self) — the deverbal -er/-or family is
    # forward-generated; these are the non-derivational ones
    "judge":      ("judge.01", "judge.01", (0,), ()),
    "soldier":    ("soldier.01", "", (0,), ()),
    "guard":      ("guard.01", "guard.01", (0,), ()),
    "pilot":      ("pilot.01", "pilot.01", (0,), ()),
    "pioneer":    ("pioneer.01", "pioneer.01", (0,), ()),
    "champion":   ("champion.01", "", (0,), ()),
    "warrior":    ("warrior.01", "", (0,), ()),
    # relational / kinship nouns (a0 self, a1 = the alter)
    "sister":     ("sister.01", "", (0,), (1,)),
    "father":     ("father.01", "", (0,), (1,)),
    "mother":     ("mother.01", "", (0,), (1,)),
    "son":        ("son.01", "", (0,), (1,)),
    "daughter":   ("daughter.01", "", (0,), (1,)),
    "wife":       ("wife.01", "", (0,), (1,)),
    "husband":    ("husband.01", "", (0,), (1,)),
    "cousin":     ("cousin.01", "", (0,), (1,)),
    "uncle":      ("uncle.01", "", (0,), (1,)),
    "aunt":       ("aunt.01", "", (0,), (1,)),
    "friend":     ("friend.01", "", (0,), (1,)),
    "ally":       ("ally.01", "", (0,), (1,)),
    "enemy":      ("enemy.01", "", (0,), (1,)),
    "rival":      ("rival.01", "rival.01", (0,), (1,)),
    "neighbor":   ("neighbor.01", "", (0,), (1,)),
    "partner":    ("partner.01", "", (0,), (1,)),
    "colleague":  ("colleague.01", "", (0,), (1,)),
    "counterpart": ("counterpart.01", "", (0,), (1,)),
    "aide":       ("aide.01", "", (0,), (2,)),
    # group / organization nouns (plain rolesets)
    "team":       ("team.01", "", (), ()),
    "army":       ("army.01", "", (), ()),
    "committee":  ("committee.01", "", (), ()),
    "council":    ("council.01", "", (), ()),
    "union":      ("union.01", "", (), ()),
    "coalition":  ("coalition.01", "", (), ()),
    "alliance":   ("alliance.01", "", (), ()),
    "brigade":    ("brigade.01", "", (), ()),
    "militia":    ("militia.01", "", (), ()),
    "faction":    ("faction.01", "", (), ()),
    "crowd":      ("crowd.01", "", (), ()),
    "delegation": ("delegation.01", "delegate.01", (), ()),
    "staff":      ("staff.01", "", (), ()),
    "crew":       ("crew.01", "", (), ()),
    "squad":      ("squad.01", "", (), ()),
    "panel":      ("panel.01", "", (), ()),
    "jury":       ("jury.01", "", (), ()),
    # locative / political nouns
    "homeland":   ("homeland.01", "", (), ()),
    # event / artifact nouns from the public NomBank lexicon
    "majority":   ("majority.01", "", (), ()),
    "war":        ("war.01", "", (), ()),
}


@lru_cache(maxsize=None)
def grown_noun_frames(extra_verbs: tuple[tuple[str, str], ...] = ()) -> tuple[
        dict[str, tuple[str, str]],
        dict[str, tuple[list[int], list[int]]]]:
    """(noun lemma → (NomBank id, PropBank id),
        NomBank id → (mandatory, optional) self-arg numbers).

    NomBank-style: the noun's roleset shares the source verb's
    argument structure; agentive -er/-or nominals incorporate their A0
    (resources/NomBank.java self-arg semantics), process/result
    nominals get an optional A1.  ``extra_verbs`` lets the caller feed
    additional (lemma, roleset) pairs (e.g. the pinned core verbs) into
    the generation.
    """
    verbs = dict(grown_verb_frames())
    verbs.update(dict(extra_verbs))
    frames: dict[str, tuple[str, str]] = {}
    self_args: dict[str, tuple[list[int], list[int]]] = {}
    for verb, roleset in sorted(verbs.items()):
        for noun, kind in _nominal_candidates(verb):
            if noun in NOMINALIZATION_BLOCKLIST:
                continue
            nb_id = f"{noun}.01"
            frames.setdefault(noun, (nb_id, roleset))
            if kind == "agent":
                self_args.setdefault(nb_id, ([0], []))
            else:
                self_args.setdefault(nb_id, ([], [1]))
    for noun, verb in NOMINALIZATION_IRREGULAR.items():
        if verb in verbs:
            frames[noun] = (f"{noun}.01", verbs[verb])
            self_args.setdefault(f"{noun}.01", ([], [1]))
    for noun in ZERO_NOMINALS:
        if noun in verbs:
            # no self-args: a zero-derivation nominal is the event
            # itself and its arguments come from its own modifiers
            frames[noun] = (f"{noun}.01", verbs[noun])
    for noun, verb in IRREGULAR_AGENTIVE.items():
        if verb in verbs:
            frames[noun] = (f"{noun}.01", verbs[verb])
            self_args.setdefault(f"{noun}.01", ([0], []))
    for noun, verb in IRREGULAR_PATIENTIVE.items():
        if verb in verbs:
            frames[noun] = (f"{noun}.01", verbs[verb])
            self_args.setdefault(f"{noun}.01", ([1], []))
    for noun, (nb_id, pb_id, mand, opt) in COMMON_NOUNS.items():
        frames[noun] = (nb_id, pb_id)
        if mand or opt:
            self_args[nb_id] = (list(mand), list(opt))
        else:
            # a bare roleset must NOT register an (empty) self-arg row —
            # presence in NOUN_SELF_ARGS flips downstream two-instance
            # handling
            self_args.pop(nb_id, None)
    return frames, self_args


# ---------------------------------------------------------------------------
# gazetteer growth: public country list (DBpedia resource == underscored
# name) + given names / org suffixes for shape-based NER typing
# ---------------------------------------------------------------------------

COUNTRIES = """
Afghanistan Albania Algeria Andorra Angola Argentina Armenia Australia
Austria Azerbaijan Bahrain Bangladesh Barbados Belarus Belgium Belize Benin
Bhutan Bolivia Botswana Brazil Brunei Bulgaria Burundi Cambodia Cameroon
Canada Chad Chile China Colombia Croatia Cuba Cyprus Denmark Djibouti
Dominica Ecuador Egypt Eritrea Estonia Ethiopia Fiji Finland France Gabon
Gambia Georgia Germany Ghana Greece Grenada Guatemala Guinea Guyana Haiti
Honduras Hungary Iceland India Indonesia Iran Iraq Ireland Israel Italy
Jamaica Japan Jordan Kazakhstan Kenya Kiribati Kosovo Kuwait Kyrgyzstan Laos
Latvia Lebanon Lesotho Liberia Libya Liechtenstein Lithuania Luxembourg
Madagascar Malawi Malaysia Maldives Mali Malta Mauritania Mauritius Mexico
Micronesia Moldova Monaco Mongolia Montenegro Morocco Mozambique Myanmar
Namibia Nauru Nepal Nicaragua Niger Nigeria Norway Oman Pakistan Palau
Panama Paraguay Peru Poland Portugal Qatar Romania Russia Rwanda Samoa
Senegal Serbia Seychelles Singapore Slovakia Slovenia Somalia Spain Sudan
Suriname Sweden Switzerland Syria Taiwan Tajikistan Tanzania Thailand Togo
Tonga Tunisia Turkey Turkmenistan Tuvalu Uganda Ukraine Uruguay Uzbekistan
Vanuatu Venezuela Vietnam Yemen Zambia Zimbabwe
""".split()

MULTIWORD_COUNTRIES = [
    "United States", "United Kingdom", "New Zealand", "South Africa",
    "South Korea", "North Korea", "Saudi Arabia", "Sri Lanka",
    "Costa Rica", "El Salvador", "Czech Republic", "Dominican Republic",
    "Sierra Leone", "Burkina Faso", "Papua New Guinea",
    "United Arab Emirates", "Cape Verde", "Ivory Coast", "San Marino",
    "Solomon Islands", "North Macedonia", "Equatorial Guinea",
    "Guinea-Bissau", "Timor-Leste", "Vatican City", "Marshall Islands",
    "Trinidad and Tobago", "Antigua and Barbuda", "Bosnia and Herzegovina",
    "the Netherlands", "the Philippines", "the Bahamas", "the Congo",
]

GIVEN_NAMES = frozenset("""
Aaron Abdul Abdullah Adam Ahmed Aisha Alan Albert Alex Alexander Alexandra
Ali Alice Amanda Amelia Amir Amy Ana Andrea Andrew Angela Ann Anna Anne
Anthony Antonio Arthur Ashley Ayesha Barbara Benjamin Bernard Beth Betty
Bill Bob Brandon Brian Bruce Carl Carlos Carmen Carol Caroline Catherine
Chad Charles Charlotte Chen Chris Christian Christina Christine Christopher
Claire Claudia Craig Daniel Danielle David Deborah Dennis Diana Diane
Diego Dmitri Donald Donna Dorothy Douglas Edward Elena Elizabeth Emily Emma
Eric Erik Eva Evelyn Fatima Felix Fernando Frances Francis Frank Fred
Gabriel Gary George Gerald Gloria Grace Gregory Hannah Hans Harold Harry
Hassan Heather Helen Henry Hiroshi Hugo Ian Ibrahim Igor Irene Isaac Isabel
Ivan Jack Jacob James Jamie Jane Janet Jason Javier Jean Jeffrey Jennifer
Jeremy Jessica Jesus Jim Joan Joe John Jonathan Jorge Jose Joseph Joshua
Juan Judith Julia Julie Justin Karen Karl Katherine Kathleen Keith Kelly
Kenneth Kevin Kim Kofi Kumar Larry Laura Lawrence Lee Leon Linda Lisa Louis
Lucas Luis Luke Madeleine Manuel Marc Marco Margaret Maria Marie Mario Mark
Martha Martin Mary Matthew Maureen Max Maya Mehmet Melissa Michael Michelle
Miguel Mohamed Mohammed Muhammad Nancy Natalia Nathan Nicholas Nicole Nina
Noah Olga Oliver Olivia Omar Oscar Pablo Pamela Patricia Patrick Paul Paula
Pedro Peter Philip Pierre Rachel Ralph Raymond Rebecca Ricardo Richard
Robert Roberto Roger Ronald Rosa Rose Roy Russell Ruth Ryan Salim Samuel
Sandra Sara Sarah Scott Sean Sergei Sharon Simon Sofia Sophia Stephanie
Stephen Steve Steven Susan Tamara Teresa Thomas Timothy Tina Todd Tom
Victor Victoria Vladimir Walter Wang Wei William Yuki Yusuf Zhang
""".split())

ORG_SUFFIXES = frozenset("""
corp corporation inc incorporated llc ltd limited plc group industries
systems labs laboratories holdings partners ventures media software
dynamics networks capital energy analytics logistics bank motors pharma
robotics airlines foods retail insurance mining telecom shipping cloud
studios solar wind steel water travel games farms courier optics security
biotech fashion gold hotels marine consulting realty cosmetics construction
kitchens university college institute ministry agency committee council
association organization foundation front army police court commission
authority federation union party fund center centre department bureau
office administration society club league times post journal news
""".split())


# globally notable organizations whose DBpedia resource name is public
# knowledge (mostly the underscored surface; a few canonical aliases).
# Same class of public fact as the country list — prominent
# international bodies, militant groups and agencies any news-register
# linker must know.
WELL_KNOWN_ORGS: dict[str, str] = {
    "United Nations": "United_Nations",
    "European Union": "European_Union",
    "World Bank": "World_Bank",
    "International Monetary Fund": "International_Monetary_Fund",
    "IMF": "International_Monetary_Fund",
    "NATO": "NATO",
    "World Health Organization": "World_Health_Organization",
    "Red Cross": "International_Committee_of_the_Red_Cross",
    "African Union": "African_Union",
    "Arab League": "Arab_League",
    "World Trade Organization": "World_Trade_Organization",
    "Security Council": "United_Nations_Security_Council",
    "State Department": "United_States_Department_of_State",
    "Pentagon": "The_Pentagon",
    "White House": "White_House",
    "Congress": "United_States_Congress",
    "Senate": "United_States_Senate",
    "Supreme Court": "Supreme_Court_of_the_United_States",
    "CIA": "Central_Intelligence_Agency",
    "FBI": "Federal_Bureau_of_Investigation",
    "Taliban": "Taliban",
    "Hezbollah": "Hezbollah",
    "Hamas": "Hamas",
    "Al Qaeda": "Al-Qaeda",
    "Al-Qaeda": "Al-Qaeda",
    "Islamic State": "Islamic_State",
    "Boko Haram": "Boko_Haram",
    # NOTE (VERDICT r4 item 1b / ADVICE): the eval-pm-corpus entities
    # ("Nusra Front" aliases, "Free Syrian Army", "Syrian opposition")
    # were moved back to the quarantined lexicon.EVAL_PM_GAZETTEER
    # where their provenance puts them.
    "Muslim Brotherhood": "Muslim_Brotherhood",
    "Red Crescent": "Red_Crescent",
    "Interpol": "Interpol",
    "UNESCO": "UNESCO",
    "UNICEF": "UNICEF",
    "OPEC": "OPEC",
    "Federal Reserve": "Federal_Reserve",
    "European Central Bank": "European_Central_Bank",
    "Wall Street": "Wall_Street",
    # globally famous companies (DBpedia resource == name)
    "Samsung": "Samsung", "Apple": "Apple_Inc.", "Google": "Google",
    "Microsoft": "Microsoft", "Amazon": "Amazon_(company)",
    "Toyota": "Toyota", "Boeing": "Boeing", "Airbus": "Airbus",
    "Sony": "Sony", "Siemens": "Siemens", "Nokia": "Nokia",
    "Huawei": "Huawei", "Tesla": "Tesla,_Inc.", "Intel": "Intel",
    "IBM": "IBM", "Shell": "Shell_plc", "Volkswagen": "Volkswagen",
    "Nestlé": "Nestlé", "Nestle": "Nestlé",
}


@lru_cache(maxsize=None)
def grown_gazetteer() -> dict[str, tuple[str, str, float]]:
    """Country + notable-org surface → (NE type, DBpedia resource,
    confidence) — the name classes whose public surface IS (or
    canonically maps to) its DBpedia resource name."""
    out: dict[str, tuple[str, str, float]] = {}
    for c in COUNTRIES:
        out[c] = ("LOCATION", c, 0.8)
    for c in MULTIWORD_COUNTRIES:
        surface = c
        res = c[4:] if c.startswith("the ") else c
        out[surface] = ("LOCATION", res.replace(" ", "_"), 0.8)
        if c.startswith("the "):
            out[res] = ("LOCATION", res.replace(" ", "_"), 0.8)
    for surface, res in WELL_KNOWN_ORGS.items():
        out[surface] = ("ORGANIZATION", res, 0.8)
        out["the " + surface] = ("ORGANIZATION", res, 0.8)
    return out


# ---------------------------------------------------------------------------
# RULE-ONLY open-vocabulary morphology (VERDICT r4 item 2): the strict
# profile's fallback path.  No table lookups against quarantinable
# vocabulary — every function below is pure orthographic rule, so the
# mechanical gold-disjoint ablation cannot be routed around through it.
# ---------------------------------------------------------------------------

# lemmas whose final double consonant is lexical, not suffix-doubling
_NO_UNDOUBLE = frozenset({"add", "err", "egg", "ebb", "inn", "odd",
                          "putt", "purr", "buzz", "fizz", "staff",
                          "stuff", "bluff", "sniff", "stiff"})

_VOWELS = "aeiou"


def _syllable_groups(stem: str) -> int:
    import re

    return len(re.findall(r"[aeiouy]+", stem))


def restore_e(stem: str) -> tuple[str, bool]:
    """Heuristic un-suffixing repair for a verb stem produced by
    stripping -ed/-ing: restore a dropped final 'e', undo consonant
    doubling, undo i→y.  → (lemma, confident).  ``confident`` is False
    exactly for the spelling-ambiguous class (multisyllabic CVC-final
    stems like visit/invite, honor/ignore) where orthography cannot
    decide — callers that must not overclaim (e.g. the deverbal-noun
    PropBank projection) treat those as NomBank-only."""
    if not stem:
        return stem, False
    c = stem[-1]
    # suffix-created double consonant: plann→plan, shipp→ship
    if (len(stem) >= 3 and c == stem[-2] and c not in _VOWELS + "ls"
            and stem not in _NO_UNDOUBLE):
        return stem[:-1], True
    if c == "i":
        return stem[:-1] + "y", True                  # studi→study
    if c in "cgvuz":
        return stem + "e", True                       # fac/chang/serv/continu
    if c in "sz" and not stem.endswith("ss"):
        return stem + "e", True                       # disclos→disclose
    if (len(stem) >= 3 and stem[-2] in _VOWELS
            and stem[-3] not in _VOWELS and c not in "aeiouwxy"):
        # single-vowel-then-consonant ending (CVC): the doubling rule
        # would have fired had the lemma ended in this consonant, so an
        # undoubled spelling usually implies a dropped 'e'
        if _syllable_groups(stem) == 1:
            return stem + "e", True                   # fin→fine, mak→make
        if stem.endswith(("at", "ut")):
            return stem + "e", True                   # devastat→devastate
        if stem.endswith(("ar", "ir", "ur")):
            return stem + "e", True                   # compar/requir/captur
        # visit/invite ambiguity class: keep the stem, flag uncertain
        return stem, False
    return stem, True                                 # warn, help, deal, suggest


def ed_lemma(form: str) -> str:
    """Lemma of an unknown -ed form (rule-only)."""
    low = form.lower()
    if low.endswith("ied"):
        return low[:-3] + "y"                         # studied→study
    if low.endswith("eed"):
        return low[:-1]                               # agreed→agree
    if low.endswith("yed"):
        return low[:-2]                               # stayed→stay
    stem, _ = restore_e(low[:-2])
    return stem


def ing_lemma(form: str) -> str:
    """Lemma of an unknown -ing form (rule-only)."""
    low = form.lower()
    if low.endswith("ying") and len(low) > 5:
        return low[:-4] + "y" if low[-5] not in _VOWELS else low[:-3]
    stem, _ = restore_e(low[:-3])
    return stem


def s_lemma(form: str) -> str:
    """Lemma of an unknown 3sg -s form (rule-only)."""
    low = form.lower()
    if low.endswith("ies") and len(low) > 4:
        return low[:-3] + "y"
    if low.endswith(("shes", "ches", "sses", "xes", "zes", "oes")):
        return low[:-2]
    return low[:-1]


# non-deverbal nouns the reverse rules would wrongly analyze (public
# junk-word guard, same role as NOMINALIZATION_BLOCKLIST for the
# forward direction)
REVERSE_BLOCKLIST = frozenset({
    "member", "number", "officer", "customer", "computer", "character",
    "quarter", "corner", "chapter", "letter", "matter", "monster",
    "semester", "disaster", "sister", "master", "minister", "water",
    "weather", "mother", "father", "brother", "daughter", "order",
    "other", "paper", "power", "summer", "winter", "center", "theater",
    "author", "doctor", "mirror", "error", "horror", "terror", "mayor",
    "anchor", "harbor", "honor", "armor", "flavor", "razor", "rumor",
    "tumor", "humor", "vapor", "motor", "sector", "factor", "victor",
    "morning", "evening", "building", "ceiling", "wedding", "clothing",
    "something", "anything", "everything", "nothing", "thing", "king",
    "ring", "wing", "spring", "string", "sibling", "darling",
    "committee", "fee", "tree", "degree", "coffee", "knee", "bee",
    "career", "beer", "deer", "sheer", "steer", "frontier", "soldier",
    "barrier", "carrier", "courier", "premier", "cashier", "glacier",
    "mission", "station", "nation", "fashion", "section", "caption",
    "condition", "position", "tradition", "edition", "ambition",
    "fraction", "function", "emotion", "portion", "region", "religion",
    "opinion", "onion", "union", "version", "vision", "passion",
    "session", "fiction", "option", "junction", "mansion", "pension",
    "moment", "comment", "segment", "element", "instrument", "document",
    "apartment", "department", "environment", "equipment", "cement",
    "parliament", "ornament", "tournament", "testament", "monument",
    "continent", "content", "incident", "president", "resident",
    "student", "parent", "talent", "agent", "accident",
    "animal", "capital", "hospital", "general", "signal", "metal",
    "crystal", "total", "final", "festival", "interval", "rival",
    "medal", "pedal", "scandal", "sandal", "journal", "terminal",
    "criminal", "cardinal", "marginal", "original", "principal",
})


@lru_cache(maxsize=65536)
def deverbal_analysis(lemma: str) -> tuple[str, str, str] | None:
    """Open-vocabulary NomBank-shaped analysis of an UNKNOWN noun
    lemma: → (nombank id, propbank id or "", kind) via reverse
    derivational morphology, or None when the noun does not look
    deverbal.  kind ∈ {agent, patient, result}.  The PropBank id is
    emitted only when the derived verb lemma is orthographically
    certain (restore_e confident) — otherwise the row is NomBank-only,
    exactly the reference's behavior for NomBank rolesets without a
    verbal counterpart (resources/NomBank.java getPBId)."""
    low = lemma.lower()
    if len(low) < 5 or not low.isalpha() or low in REVERSE_BLOCKLIST \
            or low in NOMINALIZATION_BLOCKLIST:
        return None
    nb_id = f"{low}.01"

    def pb(verb: str, confident: bool) -> str:
        return f"{verb}.01" if confident and len(verb) >= 3 else ""

    if low.endswith("ment") and len(low) >= 7:
        return nb_id, pb(low[:-4], True), "result"    # govern+ment
    if low.endswith("ication") and len(low) >= 9:
        return nb_id, pb(low[:-7] + "y", True), "result"   # apply
    if low.endswith("ization") and len(low) >= 9:
        return nb_id, pb(low[:-5] + "e", True), "result"   # organize
    if low.endswith("eation"):
        # the -eate verb class needs its 'e' back (creation→create) —
        # restore_e's vowel-pair guard would confidently keep the bare
        # stem (review r5 finding #5)
        return nb_id, pb(low[:-3] + "e", True), "result"
    if low.endswith("tion") or low.endswith("sion"):
        stem, conf = restore_e(low[:-3])              # suggest(ion)
        return nb_id, pb(stem, conf), "result"
    if low.endswith(("ance", "ence")) and len(low) >= 7:
        stem, conf = restore_e(low[:-4])
        return nb_id, pb(stem, conf), "result"        # accept+ance
    if low.endswith("al") and len(low) >= 6 and low[-3] in "svw":
        stem, conf = restore_e(low[:-2])
        return nb_id, pb(stem, conf), "result"        # approv(e)+al
    if low.endswith("ing") and len(low) >= 6:
        stem, conf = restore_e(low[:-3])
        return nb_id, pb(stem, conf), "result"        # deal+ing, paint+ing
    if low.endswith("eer") and len(low) >= 6:
        # -eer agentives are zero-derivation verbs (volunteer,
        # engineer, pioneer) — the noun surface IS the verb lemma
        return nb_id, pb(low, True), "agent"
    if low.endswith("ee") and len(low) >= 6:
        return nb_id, pb(low[:-2], True), "patient"   # employ+ee
    if low.endswith(("er", "or")) and len(low) >= 5:
        stem, conf = restore_e(low[:-2])
        return nb_id, pb(stem, conf), "agent"         # fight+er, invest+or
    return None


def classify_ne_span(forms: list[str]) -> str:
    """Shape-based NE type for an unknown capitalized span (the
    open-vocabulary fallback when no gazetteer entry matches — the
    degradation a Spotlight-less annotator should have instead of
    silently dropping the name; VERDICT r2 'what's missing' #1)."""
    lows = [f.lower() for f in forms]
    if any(l.rstrip(".,") in ORG_SUFFIXES for l in lows):
        return "ORGANIZATION"
    if forms and forms[0] in GIVEN_NAMES:
        return "PERSON"
    if len(forms) == 1 and forms[0] in grown_gazetteer():
        return "LOCATION"
    return "ORGANIZATION"
