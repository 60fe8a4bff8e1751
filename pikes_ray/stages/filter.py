"""F1-F17 — annotation cleanup passes (≙ NAFFilter, pikes-resources/
.../NAFFilter.java:248-333).

The reference's NAFFilter mutates one NAF document in place through ~20
ordered boolean-flagged passes.  Every pass operates *within* one
document, so the whole filter is one fused per-row transformation inside
a single ``map_batches`` stage (SURVEY §2.3) — pure functions over the
nested annotation columns, flag-compatible config below.

Passes without a counterpart in our annotation model (term-sense WordNet
completion F1/F2, PreMOn rewriting F17 — we emit PreMOn-prefixed CURIEs
directly) are documented no-ops so the flag surface stays parallel.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

from pikes_ray.functions import lexicon as lx
from pikes_ray.functions.numbers import parse_number_words, parse_ordinal, fmt_num
from pikes_ray.schema import ANNOTATED_SCHEMA

_VALUE_TYPES = {"MONEY", "PERCENT", "ORDINAL", "CARDINAL"}
_DET_TAGS = {"DT", "IN"}


@dataclass(frozen=True)
class FilterConfig:
    """Flag names/defaults mirror NAFFilter.Builder (NAFFilter.java:202-234)."""

    term_sense_completion: bool = True      # F2  (:388-496; consumed by
                                            #     the extractor: WN/SUMO/
                                            #     YAGO typing emission)
    entity_remove_overlaps: bool = True     # F3  (:536-568)
    entity_span_fixing: bool = True         # F4  (:498-534)
    entity_addition: bool = True            # F7  (:570-623)
    entity_value_normalization: bool = True  # F8 (:625-665)
    linking_completion: bool = True         # F5  (:667-750)
    linking_fixing: bool = False            # F6  (:752-781, off by default)
    srl_preprocess: bool = True             # F9  (:985-1107)
    srl_remove_wrong_refs: bool = True      # F10 (:1109-1161)
    srl_remove_unknown_predicates: bool = False  # F11 (:1163-1187, off by default)
    srl_predicate_addition: bool = True     # F12 (:1189-1244)
    srl_self_arg_fixing: bool = True        # F13 (:1246-1308)
    srl_role_linking: bool = True           # F16 (:1462-1483)
    coref_for_role_dependencies: bool = False  # F18 (:895-983, off by default)
    coref_span_fixing: bool = False         # F19 (off by default)
    opinion_linking: bool = True            # F20 (:1485-1519) — consumed by
                                            #     the extractor: T8 links
                                            #     expression/target/holder
                                            #     heads to instances


def _span_terms(tokens: list[dict], s: int, e: int) -> list[dict]:
    return tokens[s:e]


def filter_document(ann: dict, cfg: FilterConfig) -> dict:
    """Apply the enabled passes, in NAFFilter.filter order (:248-333)."""
    tokens = ann["tokens"]
    entities = list(ann["entities"])
    predicates = list(ann["predicates"])
    corefs = list(ann["corefs"])

    # F4 entitySpanFixing — re-span via filterTerms: drop leading
    # determiners/preps + non-alnum edge tokens (NAFUtils.java:153-171).
    if cfg.entity_span_fixing:
        fixed = []
        for e in entities:
            s, t = e["start"], e["end"]
            while s < t and (tokens[s]["morphofeat"] in _DET_TAGS
                             and not (e["named"] and tokens[s]["form"][0].isupper())):
                s += 1
            while t > s and not tokens[t - 1]["form"][0].isalnum():
                t -= 1
            if s < t:
                fixed.append({**e, "start": s, "end": t})
        entities = fixed

    # F3 entityRemoveOverlaps — drop entities strictly contained in others.
    if cfg.entity_remove_overlaps:
        keep = []
        for i, e in enumerate(entities):
            contained = any(
                j != i
                and o["start"] <= e["start"] and e["end"] <= o["end"]
                and (o["end"] - o["start"]) > (e["end"] - e["start"])
                for j, o in enumerate(entities)
            )
            if not contained:
                keep.append(e)
        entities = keep

    # F5 linkingCompletion — promote entity links onto same-head
    # entities and predicates (NAFFilter.java:667-750).  In our model
    # linked-entity candidates ARE entities (the gazetteer writes links
    # directly), so the "create a new entity for an uncovered link
    # span" branch (:687-714) cannot arise; what remains is the link
    # promotion: any entity or predicate whose head term matches a
    # linked entity's head inherits the (link, confidence) pair when
    # missing, or the higher confidence when already linked.
    if cfg.linking_completion:
        link_of_head: dict[int, tuple[str, float]] = {}
        for e in entities:
            if e["link"]:
                h = e["end"] - 1
                if h not in link_of_head or e["link_conf"] > link_of_head[h][1]:
                    link_of_head[h] = (e["link"], e["link_conf"])
        for e in entities:
            got = link_of_head.get(e["end"] - 1)
            if got is None:
                continue
            if not e["link"]:
                e["link"], e["link_conf"] = got
            elif e["link"] == got[0] and e["link_conf"] < got[1]:
                e["link_conf"] = got[1]
        named_heads = {e["end"] - 1 for e in entities
                       if e["named"] and e["link"]}
        for p in predicates:
            if p["source"] == "nominal" and p["head"] in named_heads:
                # the head noun of a linked named entity ("the Syrian
                # opposition") — the dbpedia link belongs to the entity
                # instance, not the opposition_v frame (gold.8)
                continue
            got = link_of_head.get(p["head"])
            if got is not None and not p["link"]:
                p["link"], p["link_conf"] = got

    # F9 srlPreprocess — drop headless predicates; merge predicates on
    # the same head term (Mate⊎Semafor merge analogue: union roles, the
    # verbal source wins the sense — NAFFilter.java:1044-1106).
    if cfg.srl_preprocess:
        by_head: dict[tuple[int, int], dict] = {}
        for p in predicates:
            if p["head"] is None or p["head"] >= len(tokens):
                continue
            key = (p["head"], p.get("variant", 0))
            prev = by_head.get(key)
            if prev is None:
                by_head[key] = dict(p, roles=list(p["roles"]))
            else:
                if prev["source"] != "verbal" and p["source"] == "verbal":
                    prev["sense"], prev["source"] = p["sense"], p["source"]
                    prev["copular"] = p["copular"]
                spans = {(r["start"], r["end"]) for r in prev["roles"]}
                prev["roles"].extend(
                    r for r in p["roles"] if (r["start"], r["end"]) not in spans
                )
        predicates = [by_head[h] for h in sorted(by_head)]

    # F10 srlRemoveWrongRefs — drop predicates whose sense disagrees with
    # the head lemma (NAFFilter.java:1109-1161 lemma/sense sanity check).
    if cfg.srl_remove_wrong_refs:
        ok = []
        for p in predicates:
            if p["source"] == "semafor":
                # the lemma/sense agreement check is a PropBank-roleset
                # check; second-source FrameNet frames are exempt (the
                # reference validates PB external refs only)
                ok.append(p)
                continue
            lemma = tokens[p["head"]]["lemma"]
            # check the roleset in the predicate's OWN model first: a
            # nominal predicate validates against the NomBank→PB
            # mapping ("sanctions" → impose.01), not the homographic
            # verb's roleset (sanction.01) — NAFFilter validates the
            # external ref against the matching resource
            # validation uses the TABLE index only (the reference's
            # NAFFilter validates against its loaded framesets and
            # leaves unknown lemmas alone); the open-vocab fallback
            # must NOT widen this — verb_sense() is never None for
            # alphabetic lemmas in open profiles, which would silently
            # drop externally-supplied cross-lemma senses carried by
            # NAF interop documents (review r5 finding #6)
            nf = lx.NOUN_FRAMES.get(lemma)
            if p["source"] == "nominal" and nf is not None:
                expected = nf[1]
            else:
                expected = lx.VERB_FRAMES.get(lemma)
                if expected is None and nf is not None:
                    expected = nf[1]
            if expected is None or expected == p["sense"] \
                    or (p["sense"] and "." in p["sense"] and "." in expected
                        and p["sense"].split(".")[0] == expected.split(".")[0]):
                ok.append(p)
        predicates = ok

    # F11 srlRemoveUnknownPredicates — drop predicates whose roleset is
    # not in the known PropBank/NomBank index (NAFFilter.java:1163-1187;
    # off by default like the reference)
    if cfg.srl_remove_unknown_predicates:
        known = set(lx.VERB_FRAMES.values()) \
            | {pb for (_nb, pb) in lx.NOUN_FRAMES.values() if pb} \
            | {""}
        predicates = [p for p in predicates if p["sense"] in known]

    # F12 srlPredicateAddition — add a predicate for every term with a
    # unique known roleset for its lemma, when none covers it (:1189-1244).
    if cfg.srl_predicate_addition:
        covered = {p["head"] for p in predicates}
        for i, t in enumerate(tokens):
            if i in covered:
                continue
            if t["morphofeat"].startswith("VB") \
                    and lx.verb_sense(t["lemma"]) is not None:
                if t["lemma"] in ("have", "be"):
                    # auxiliary: the following participle carries the
                    # predicate ("has become", "may be running")
                    nxt = i + 1
                    while nxt < len(tokens) and tokens[nxt]["morphofeat"] in ("RB", "MD"):
                        nxt += 1
                    if nxt < len(tokens) \
                            and tokens[nxt]["morphofeat"] in ("VB", "VBD", "VBN", "VBG") \
                            and lx.verb_sense(tokens[nxt]["lemma"]) is not None:
                        continue
                predicates.append({"head": i, "sense": lx.verb_sense(t["lemma"]),
                                   "source": "verbal", "variant": 0,
                                   "copular": t["lemma"] == "be",
                                   "link": "", "link_conf": 0.0,
                                   "factuality": "", "roles": []})
            elif t["morphofeat"] in ("NN", "NNS") \
                    and lx.noun_frame(t["lemma"]) is not None:
                # same premod exception as the annotator: an NMOD
                # premodifier of another roleset noun stays a quality
                gov = next((d["frm"] for d in ann["deps"]
                            if d["to"] == i and d["rfunc"] == "NMOD"), None)
                if gov is not None and gov < len(tokens) \
                        and tokens[gov]["morphofeat"] in ("NN", "NNS") \
                        and lx.noun_frame(tokens[gov]["lemma"]) is not None:
                    continue
                predicates.append({"head": i, "sense": lx.noun_frame(t["lemma"])[1],
                                   "source": "nominal", "copular": False,
                                   "variant": 0,
                                   "link": "", "link_conf": 0.0,
                                   "factuality": "", "roles": []})
        predicates.sort(key=lambda p: p["head"])

    # F13 srlSelfArgFixing — NomBank incorporated-argument repair
    # (NAFFilter.java:1246-1308): for nominal predicates with a known
    # roleset, a self-role (role head == predicate term) whose arg
    # number is neither mandatory nor optional is dropped, and every
    # missing MANDATORY self-arg is added as a role on the predicate
    # term itself (the incorporated noun referent).
    if cfg.srl_self_arg_fixing:
        for p in predicates:
            if p["source"] != "nominal":
                continue        # skip verbs (:1252-1255)
            lemma = tokens[p["head"]]["lemma"]
            nb_id = (lx.noun_frame(lemma) or (None,))[0]
            roleset = lx.NOUN_SELF_ARGS.get(nb_id)
            if roleset is None:
                continue
            mandatory, optional = roleset
            current = -1
            kept = []
            for r in p["roles"]:
                if r["head"] == p["head"] and len(r["sem_role"]) == 2 \
                        and r["sem_role"][0] == "A" and r["sem_role"][1].isdigit():
                    num = int(r["sem_role"][1])
                    if num in mandatory or num in optional:
                        current = num
                        kept.append(r)
                    # else: invalid self-role removed (:1280-1287)
                else:
                    kept.append(r)
            p["roles"] = kept
            for arg in mandatory:
                if arg == current:
                    continue
                p["roles"].append({"sem_role": f"A{arg}",
                                   "start": p["head"], "end": p["head"] + 1,
                                   "head": p["head"],
                                   "prep": "", "models": "", "fn_role": ""})

    # F7 entityAddition — add an (unnamed) entity for every noun/pronoun
    # term not already covered by an entity or predicate head (:570-623).
    if cfg.entity_addition:
        covered = [False] * len(tokens)
        for e in entities:
            for k in range(e["start"], e["end"]):
                covered[k] = True
        pred_heads = {p["head"] for p in predicates}
        for i, t in enumerate(tokens):
            if covered[i] or i in pred_heads:
                continue
            if t["morphofeat"] in ("NN", "NNS", "PRP", "PRP$", "WP", "WDT") \
                    and not (t["morphofeat"] == "WDT" and t["lemma"] == "that"):
                entities.append({"etype": "", "start": i, "end": i + 1,
                                 "named": False, "link": "", "link_conf": 0.0,
                                 "norm": ""})
        entities.sort(key=lambda e: (e["start"], e["end"]))

    # F8 entityValueNormalization — (re)parse spelled numbers on value
    # entities missing a norm (:625-665, NumberSpeller path).
    if cfg.entity_value_normalization:
        for e in entities:
            if e["etype"] in _VALUE_TYPES and not e["norm"]:
                words = [t["form"] for t in _span_terms(tokens, e["start"], e["end"])]
                v = parse_number_words(words)
                if v is None and len(words) == 1:
                    o = parse_ordinal(words[0])
                    v = float(o) if o is not None else None
                if v is not None:
                    e["norm"] = fmt_num(v)

    # F6 linkingFixing — drop links whose surface is a stopword (:752-781).
    if cfg.linking_fixing:
        for e in entities:
            if e["link"]:
                surface = " ".join(t["form"] for t in _span_terms(tokens, e["start"], e["end"])).lower()
                if surface in lx.LINKING_STOPWORDS:
                    e["link"], e["link_conf"] = "", 0.0

    # F16 srlRoleLinking — set role heads; snap role spans to an entity
    # sharing the head term (PARTICIPATION walk analogue, :1462-1483).
    if cfg.srl_role_linking:
        ent_by_last = {e["end"] - 1: e for e in entities}
        for p in predicates:
            for r in p["roles"]:
                if r["head"] is None:
                    r["head"] = r["end"] - 1
                ent = ent_by_last.get(r["head"])
                if ent is not None and ent["start"] >= r["start"]:
                    r["start"], r["end"] = ent["start"], ent["end"]

    # F18 corefForRoleDependencies — add a coref cluster linking a
    # proper name to the appositive/title/premodified role noun it
    # fills, when the role noun is backed by a NomBank roleset with
    # declared args (applyCorefForRoleDependencies, NAFFilter.java:
    # 895-983; off by default like the reference).  The reference
    # matches APPO|TITLE|NMOD dep labels; our dep inventory carries
    # the name↔role attachment as NMOD.
    if cfg.coref_for_role_dependencies:
        coord_children: dict[int, list[int]] = {}
        conj_children: dict[int, list[int]] = {}
        for d in ann["deps"]:
            if d["rfunc"] == "COORD":
                coord_children.setdefault(d["frm"], []).append(d["to"])
            elif d["rfunc"] == "CONJ":
                conj_children.setdefault(d["frm"], []).append(d["to"])

        def _coord_expand(t: int) -> list[int]:
            # ≙ getTermsByDepAncestors({t}, "(COORD CONJ?)*")
            out, stack, seen = [], [t], set()
            while stack:
                n = stack.pop()
                if n in seen:
                    continue
                seen.add(n)
                out.append(n)
                for c in coord_children.get(n, ()):
                    stack.append(c)
                    stack.extend(conj_children.get(c, ()))
            return sorted(out)

        nominal_heads = {p["head"] for p in predicates if p["source"] == "nominal"}
        ent_span_of = {}
        for e in entities:
            for k in range(e["start"], e["end"]):
                ent_span_of.setdefault(k, (e["start"], e["end"]))
        for d in ann["deps"]:
            if d["rfunc"] != "NMOD":
                continue
            f, t = d["frm"], d["to"]
            if f >= len(tokens) or t >= len(tokens):
                continue
            pos_f, pos_t = tokens[f]["morphofeat"], tokens[t]["morphofeat"]
            # name = the proper-noun side, role = the plain-noun side;
            # the reference accepts the reversed direction only for
            # APPO, which our inventory does not emit
            if pos_f.startswith("NNP") and pos_t.startswith("NN") \
                    and not pos_t.startswith("NNP"):
                name_t, role_t = f, t
            else:
                continue
            # already coreferential? (≙ the hasHead pair check)
            if any(any(s["start"] <= name_t < s["end"] for s in cl)
                   and any(s["start"] <= role_t < s["end"] for s in cl)
                   for cl in corefs):
                continue
            # the role noun must carry an actual NomBank roleset with
            # declared mandatory/optional args (:927-944)
            if role_t not in nominal_heads:
                continue
            nb_id = (lx.noun_frame(tokens[role_t]["lemma"]) or (None,))[0]
            args = lx.NOUN_SELF_ARGS.get(nb_id)
            if args is None or not (args[0] or args[1]):
                continue
            role_heads = _coord_expand(role_t)
            name_heads = _coord_expand(name_t)
            if any(not tokens[h]["morphofeat"].startswith("NNP")
                   for h in name_heads):
                continue
            # plural agreement: one name ↔ singular role, many ↔ plural
            bad = False
            for h in role_heads:
                plural = tokens[h]["morphofeat"].endswith("S")
                if (len(name_heads) == 1 and plural) \
                        or (len(name_heads) > 1 and not plural):
                    bad = True
                    break
            if bad:
                continue
            ns, ne = ent_span_of.get(name_t, (name_t, name_t + 1))
            cluster = [{"start": ns, "end": ne}]
            cluster += [{"start": h, "end": h + 1} for h in role_heads]
            corefs.append(cluster)

    # F19 corefSpanFixing — drop coref spans without a valid in-range
    # head and clusters left with < 2 spans (applyCorefSpanFixing,
    # NAFFilter.java:783-861; off by default like the reference)
    if cfg.coref_span_fixing:
        fixed_corefs = []
        for cluster in corefs:
            spans = [s for s in cluster
                     if 0 <= s["start"] < s["end"] <= len(tokens)]
            if len(spans) >= 2:
                fixed_corefs.append(spans)
        corefs = fixed_corefs

    return {**ann, "entities": entities, "predicates": predicates, "corefs": corefs}


class FilterStage:
    """Fused F-pass ``map_batches`` stage (stateless apart from config)."""

    def __init__(self, cfg: FilterConfig | None = None):
        self.cfg = cfg or FilterConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ("tokens", "deps", "entities", "predicates", "corefs")
        data = {c: batch[c].to_pylist() for c in cols}
        n = len(batch)
        out = {c: [] for c in cols}
        for i in range(n):
            ann = {c: data[c][i] for c in cols}
            if ann["tokens"]:
                ann = filter_document(ann, self.cfg)
            for c in cols:
                out[c].append(ann[c])
        for c in cols:
            idx = batch.schema.get_field_index(c)
            typ = ANNOTATED_SCHEMA.field(c).type
            batch = batch.set_column(idx, c, pa.array(out[c], type=typ))
        return batch
