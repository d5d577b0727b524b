"""Phrase extraction: sentence dependency structure -> Phrase constructs.

Faithful re-implementation of the reference's textacy-derived extraction
(``kg_creation/sentence_analysing/util.py`` and ``phrase_extractor.py``) over
the ``tokens.py`` model: a Phrase is an agent/predicate/patient construct
(passive voice normalized so "the cat is eaten by the dog" has the dog as
agent), with nested patient/agent phrases for clausal complements and a
conditional split on subordinate conjunctions {if, unless, when, where,
while}.

Deliberate determinization: the reference materializes verb groups from
Python ``set``s (``util.py:49-57``) whose iteration order — and therefore
which predicate is "first" for the passive-voice check
(``phrase_extractor.py:112``) — is nondeterministic; we order every verb
group by token index.  Ids are caller-supplied counters instead of uuid4.
"""

from __future__ import annotations

import itertools
from typing import Callable, Iterable, List, Set, Tuple

from inclusionreferenceskg_spark.functions.tokens import Sent, Tok

SUBJECTS = ("nsubj", "nsubjpass", "csubj", "csubjpass", "agent", "expl")
SUBJ_DEPS = {"agent", "csubj", "csubjpass", "expl", "nsubj", "nsubjpass"}
OBJ_DEPS = {"attr", "dobj", "dative", "oprd", "pobj"}
AUX_DEPS = {"aux", "auxpass", "neg"}
NOMINAL_SUBJ_DEPS = {"agent", "expl", "nsubj", "nsubjpass"}
CLAUSAL_SUBJ_DEPS = {"csubj", "csubjpass"}
CONDITIONAL_SCONJ = {"if", "unless", "when", "where", "while"}


class Predicate:
    __slots__ = ("token", "id")

    def __init__(self, token: Tok, id_: str):
        self.token = token
        self.id = id_


class PhraseObject:
    __slots__ = ("token", "id", "described_by", "possessors")

    def __init__(self, token: Tok, id_: str):
        self.token = token
        self.id = id_
        self.described_by: List["Phrase"] = []
        self.possessors: List["PhraseObject"] = []


class Phrase:
    __slots__ = ("id", "agent_objects", "agent_phrases", "patient_objects",
                 "patient_phrases", "predicate", "condition_phrases")

    def __init__(self, id_: str, predicate: List[Predicate]):
        self.id = id_
        self.predicate = predicate
        self.agent_objects: List[PhraseObject] = []
        self.agent_phrases: List["Phrase"] = []
        self.patient_objects: List[PhraseObject] = []
        self.patient_phrases: List["Phrase"] = []
        self.condition_phrases: List["Phrase"] = []


def get_conjuncts(tok: Tok, allowed_pos: Set[str] = None) -> List[Tok]:
    """conj/appos right-dependents (appositions deliberately treated as
    conjunctions for enumerations, util.py:102-114)."""
    return [r for r in tok.rights
            if r.dep in ("conj", "appos")
            and (not allowed_pos or r.pos in allowed_pos)]


def get_main_verbs_of_sent(sent: Sent) -> List[List[Tok]]:
    """Non-auxiliary verbs grouped with their conjunct verbs (util.py:35-57),
    groups and members ordered by token index (determinization)."""
    seeds = [
        [tok] + get_conjuncts(tok, {"VERB", "AUX"}) for tok in sent
        if tok.pos in ("VERB", "AUX") and tok.dep not in AUX_DEPS
    ]
    groups: List[Set[int]] = []
    by_tok = {}
    for seed in seeds:
        ids = set(t.i for t in seed)
        for g in groups:
            if not g.isdisjoint(ids):
                g.update(ids)
                break
        else:
            groups.append(ids)
    for t in sent:
        by_tok[t.i] = t
    return [[by_tok[i] for i in sorted(g)] for g in groups]


def extract_prepositions(verb: Tok) -> List[Tok]:
    """All right-dependents reachable through prep/agent/acomp chains
    (util.py:64-79; LIFO order preserved)."""
    out: List[Tok] = []
    stack = [verb]
    while stack:
        p = stack.pop()
        new = [t for t in p.rights if t.dep in ("prep", "agent", "acomp")]
        stack.extend(new)
        out.extend(new)
    return out


def _closure_extend(items: List[Tok],
                    expand: Callable[[Tok], List[Tok]]) -> None:
    """Transitive conjunct closure replicating the reference's
    extend-while-iterating generators (util.py:97, :126, :141)."""
    k = 0
    while k < len(items):
        items.extend(expand(items[k]))
        k += 1


def get_objects_of_verbs(verbs: List[Tok]) -> List[Tok]:
    """util.py:82-98: objects incl. prepositional objects, adjectival/
    adverbial complements, non-verb open clausal complements, conjuncts."""
    objs: List[Tok] = []
    for verb in verbs:
        verb_and_prep = [verb] + extract_prepositions(verb)
        objs.extend(t for v in verb_and_prep for t in v.rights
                    if t.dep in OBJ_DEPS)
        objs.extend(t for t in verb.rights if t.dep in ("acomp", "advmod"))
        objs.extend(t for t in verb.rights
                    if t.dep == "xcomp" and t.pos != "VERB")
        _closure_extend(objs, lambda o: get_conjuncts(o, {o.pos}))
    return objs


def is_acl_without_subj(tok: Tok) -> bool:
    return tok.dep == "acl" and not any(c.dep in SUBJECTS for c in tok.children)


def get_nominal_subjects_of_verbs(predicates: List[Predicate]) -> List[Tok]:
    subjs: List[Tok] = []
    for pred in predicates:
        subjs.extend(t for t in pred.token.lefts if t.dep in NOMINAL_SUBJ_DEPS)
        _closure_extend(subjs, get_conjuncts)
        if is_acl_without_subj(pred.token):
            # borrowed acl head (util.py:143-145); deliberate extension vs
            # the reference: a participle attached to a coordination root
            # covers the whole coordination ("convictions and offences
            # referred to") — flagged by the parser, not inferred here
            subjs.append(pred.token.head)
            if getattr(pred.token, "acl_coord", False):
                subjs.extend(get_conjuncts(pred.token.head))
    return subjs


def is_conditional(phrase: Phrase) -> bool:
    return any(
        tok.pos == "SCONJ" and tok.text in CONDITIONAL_SCONJ
        for pred in phrase.predicate for tok in pred.token.children)


class PhraseExtractor:
    """Port of ``PhraseExtractor.extract_from_sentence``
    (phrase_extractor.py:31-184) with deterministic ids."""

    def __init__(self, id_prefix: str = ""):
        self._counter = itertools.count()
        self._prefix = id_prefix

    def _next_id(self, kind: str) -> str:
        return f"{self._prefix}{kind}{next(self._counter)}"

    def extract_from_sentence(self, sent: Sent,
                              include_extensions: bool = False) -> List[Phrase]:
        verb_groups = get_main_verbs_of_sent(sent)
        phrases = [
            Phrase(self._next_id("ph"), [
                Predicate(v, self._next_id("pr")) for v in group])
            for group in verb_groups
        ]
        deletion_marks: Set[str] = set()

        for phrase in phrases:
            phrase.agent_objects = [
                PhraseObject(t, self._next_id("po"))
                for t in get_nominal_subjects_of_verbs(phrase.predicate)]
            phrase.patient_objects = [
                PhraseObject(t, self._next_id("po"))
                for t in get_objects_of_verbs(
                    [p.token for p in phrase.predicate])]

            object_children = []
            deep_children = []
            for obj in itertools.chain(phrase.agent_objects,
                                       phrase.patient_objects):
                # direct children of each object (phrase_extractor.py:54-56);
                # additionally a DEEP scan through the object's prep/pobj
                # chains, admitted only for *conditional* clauses ("in the
                # case of transfers referred to in X" with a where/if mark)
                # — the golden CSV shows the reference links those
                # (contain/including -> conditional referred) while plain
                # participials on nested nominals (carried out on behalf
                # of...) stay top-level as in the direct-children semantics
                object_children.extend(obj.token.children)
                stack = [pc for c in obj.token.children if c.dep == "prep"
                         for pc in c.children if pc.dep == "pobj"]
                seen_n = set()
                while stack:
                    tok = stack.pop()
                    if tok.i in seen_n:
                        continue
                    seen_n.add(tok.i)
                    for c in tok.children:
                        deep_children.append(c)
                        if c.dep == "prep":
                            stack.extend(pc for pc in c.children
                                         if pc.dep == "pobj")

            phrase.patient_phrases, phrase.agent_phrases = self._link_phrases(
                deletion_marks, object_children, phrase, phrases,
                deep_children)

            self._switch_dependants_on_passive(phrase)
            self._resolve_relative_clauses(
                (phrase.agent_objects, phrase.patient_objects))
            phrase.patient_phrases, phrase.condition_phrases = \
                self._split_conditionals(phrase.patient_phrases)
            self._resolve_anaphora(phrase)

            if include_extensions:
                self._extract_adnominal_clauses(
                    itertools.chain(phrase.agent_objects,
                                    phrase.patient_objects),
                    phrases, deletion_marks)
                self._extract_possessors(
                    itertools.chain(phrase.agent_objects,
                                    phrase.patient_objects))

        for phrase in phrases:
            if not (phrase.agent_phrases or phrase.agent_objects
                    or phrase.patient_phrases or phrase.patient_objects):
                deletion_marks.add(phrase.id)

        return [p for p in phrases if p.id not in deletion_marks]

    def _link_phrases(self, deletion_marks, object_children, phrase,
                      phrases, deep_children=()) -> Tuple[List[Phrase],
                                                          List[Phrase]]:
        """Nested clauses whose predicate acts as object/subject of this
        phrase (phrase_extractor.py:147-184).  ``deep_children`` (clause
        heads found through nested prep/pobj chains rather than as direct
        object children) are only linked when the nested clause is
        conditional — see extract_from_sentence."""
        def clause_like(t):
            return (t.dep in ("ccomp", "advcl") or is_acl_without_subj(t)
                    or (t.dep == "xcomp" and t.pos in ("VERB", "AUX")))

        verb_as_patient = [
            t for pred in phrase.predicate
            for t in itertools.chain(pred.token.children, object_children)
            if clause_like(t)]

        def collect(candidates, require_conditional=False):
            found = []
            for tok in candidates:
                for p in phrases:
                    if p.id == phrase.id:
                        continue
                    if any(pred.token is tok for pred in p.predicate):
                        if require_conditional and not is_conditional(p):
                            break
                        found.append(p)
                        deletion_marks.add(p.id)
                        break
            return found

        patient = collect(verb_as_patient)
        patient += collect(
            [t for t in deep_children if clause_like(t)
             and not any(p is t for p in verb_as_patient)],
            require_conditional=True)
        verb_as_agent = [
            t for pred in phrase.predicate
            for t in itertools.chain(pred.token.children, object_children)
            if t.dep in CLAUSAL_SUBJ_DEPS]
        agent = collect(verb_as_agent)
        return patient, agent

    def _switch_dependants_on_passive(self, phrase: Phrase) -> None:
        if phrase.predicate and phrase.predicate[0].token.tag == "VBN":
            phrase.patient_objects, phrase.agent_objects = \
                phrase.agent_objects, phrase.patient_objects
            phrase.patient_phrases, phrase.agent_phrases = \
                phrase.agent_phrases, phrase.patient_phrases

    def _resolve_relative_clauses(self, objs) -> None:
        """Relative pronouns are replaced by their clause head
        (phrase_extractor.py:125-131).  When the pronoun also has a coref
        chain ("the processing it carries out": it -> enterprise,
        organisation) the antecedents are kept as additional objects —
        coreferee resolves before the rewrite discards the pronoun."""
        for objs_list in objs:
            new = []
            for po in objs_list:
                if po.token.head.dep == "relcl" and po.token.pos == "PRON":
                    orig = po.token
                    po.token = po.token.head.head
                    if orig.coref:
                        doc = orig.sent.doc
                        for extra in orig.coref:
                            new.append(PhraseObject(doc[extra],
                                                    self._next_id("po")))
            objs_list.extend(new)

    def _split_conditionals(self, phrases: Iterable[Phrase]):
        conditionals, patients = [], []
        for p in phrases:
            (conditionals if is_conditional(p) else patients).append(p)
        return patients, conditionals

    def _resolve_anaphora(self, phrase: Phrase) -> None:
        """Coref rewrite (phrase_extractor.py:187-200): the anaphor token is
        replaced by its first antecedent; extra antecedents become new
        PhraseObjects."""
        for objs in (phrase.agent_objects, phrase.patient_objects):
            new = []
            for po in objs:
                res = po.token.coref
                if res:
                    doc = po.token.sent.doc
                    po.token = doc[res[0]]
                    for extra in res[1:]:
                        new.append(PhraseObject(doc[extra],
                                                self._next_id("po")))
            objs.extend(new)

    def _extract_adnominal_clauses(self, objs, phrases, deletion_marks):
        for po in objs:
            for p in phrases:
                if any(pr.token.head is po.token and pr.token.dep == "acl"
                       for pr in p.predicate):
                    deletion_marks.add(p.id)
                    po.described_by.append(p)

    def _extract_possessors(self, objs: Iterable[PhraseObject]) -> None:
        for po in objs:
            stack = [po]
            while stack:
                cur = stack.pop()
                genitives = [PhraseObject(c, self._next_id("po"))
                             for c in cur.token.children if c.dep == "poss"]
                ofs = [PhraseObject(g, self._next_id("po"))
                       for c in cur.token.children if c.text == "of"
                       for g in c.children if g.dep == "pobj"]
                cur.possessors.extend(genitives)
                cur.possessors.extend(ofs)
                stack.extend(genitives)
                stack.extend(ofs)
