"""Deterministic linguistic annotator (the sandbox spaCy stand-in).

The reference pipeline runs spaCy ``en_core_web_sm``/``trf`` + coreferee
(``kg_renderer.py:214-232``); neither is installable here, so this module
provides a self-contained, rule-based annotator behind the same token
surface (``tokens.py``): regex tokenizer with reference-mention merging
(mentions become single ``TAG=REF, POS=PROPN`` tokens exactly like the
reference's retokenizer, ``reference_detector.py:22-45``), lexicon+suffix
POS tagging tuned to legal English, a shallow rule dependency parser
producing the dependency vocabulary the phrase extractor consumes
(nsubj/nsubjpass/aux/auxpass/neg/dobj/attr/prep/agent/pobj/conj/cc/mark/
ccomp/advcl/relcl/acl/xcomp/det/amod/compound/poss/advmod), a rule
lemmatizer, and a nearest-antecedent pronoun coref.

It is deliberately swappable: if spaCy is available in a later environment
the same ``annotate_node`` contract can be served from a real model inside
the same pandas UDF.  All lexicons are module-level (compiled once per
executor).
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple

from inclusionreferenceskg_spark.functions.tokens import (
    Sent,
    Tok,
    index_children,
    make_doc,
)

_WORD = re.compile(r"\w+(?:[-’']\w+)*|[^\w\s]")

DET = {"the", "a", "an", "this", "these", "those", "such", "each", "any",
       "all", "no", "every", "its", "their", "his", "her", "our", "your"}
PRON = {"it", "they", "he", "she", "we", "you", "i", "them", "him", "her",
        "us", "me", "who", "which", "whom", "what", "itself", "themselves"}
ADP = {"of", "in", "on", "by", "for", "with", "from", "under", "against",
       "within", "without", "at", "as", "into", "through", "per", "between",
       "during", "before", "after", "concerning", "regarding", "pursuant",
       "about", "via", "upon", "towards", "across", "behind", "above",
       "below", "near", "over"}
SCONJ = {"if", "unless", "when", "where", "while", "because", "although",
         "whether", "except", "that", "since", "insofar", "whereas"}
CCONJ = {"and", "or", "but", "nor"}
MODALS = {"shall", "may", "must", "should", "can", "could", "will", "would",
          "might"}
BE = {"is", "are", "was", "were", "be", "been", "being", "am"}
HAVE = {"has", "have", "had", "having"}
DO = {"does", "do", "did"}
ADV = {"not", "also", "only", "thereby", "however", "furthermore",
       "moreover", "therefore", "hereby", "so", "thus", "already", "always",
       "never", "further"}

#: base-form verb lexicon (legal/web register); morphology derives the rest
VERB_BASE = {
    "maintain", "notify", "adopt", "ensure", "request", "process", "publish",
    "designate", "apply", "contain", "provide", "take", "make", "carry",
    "act", "inform", "require", "protect", "keep", "collect", "store",
    "erase", "rectify", "demonstrate", "implement", "monitor", "assess",
    "comply", "cooperate", "establish", "lay", "refer", "set", "grant",
    "submit", "transfer", "restrict", "prohibit", "authorise", "authorize",
    "define", "specify", "include", "exclude", "amend", "repeal", "enter",
    "give", "use", "mean", "concern", "relate", "constitute", "remain",
    "become", "need", "seek", "obtain", "receive", "send", "break", "pay",
    "dictate", "eat", "permit", "affect", "govern", "regulate", "supervise",
    "communicate", "record", "report", "review", "verify", "examine",
    "determine", "consider", "deem", "treat", "base", "follow", "accompany",
    "suspend", "withdraw", "revoke", "impose", "limit", "extend", "exercise",
    "employ", "result", "occur", "arise", "belong", "depend", "consist",
}

_IRREGULAR_PAST = {
    "took": "take", "taken": "take", "kept": "keep", "made": "make",
    "laid": "lay", "given": "give", "gave": "give", "set": "set",
    "meant": "mean", "sought": "seek", "sent": "send", "broke": "break",
    "broken": "break", "paid": "pay", "ate": "eat", "eaten": "eat",
    "became": "become", "went": "go", "done": "do", "said": "say",
    "held": "hold", "drawn": "draw", "withdrew": "withdraw",
    "withdrawn": "withdraw",
}

#: ambiguous plural forms that are (in the legal register) always nouns —
#: "transfers of personal data", "the time limits for", "the records
#: referred to"; verbal uses ("which processes", "concerns", "results
#: from") stay out of this set.
_PLURAL_NOT_VERB = {"transfers", "limits", "records"}

#: suffix fragments produced by soft-hyphen line breaks in the source PDFs
#: ("identifi cation", "representa tive"): blockize deletes U+00AD but the
#: line-break space survives, so the tokenizer rejoins fragment pairs whose
#: first half is not itself a known word.
_FRAG_SUFFIX = {"tion", "tions", "cation", "cations", "sion", "sions",
                "tive", "tives", "ment", "ments", "ance", "ence", "bility"}


@lru_cache(maxsize=65536)
def lemmatize(word: str, pos: str) -> str:
    w = word.lower()
    if pos in ("VERB", "AUX"):
        if w in _IRREGULAR_PAST:
            return _IRREGULAR_PAST[w]
        if w in BE:
            return "be"
        if w in HAVE:
            return "have"
        if w in DO:
            return "do"
        for suffix, repls in (("ies", ("y",)), ("ing", ("", "e")),
                              ("ied", ("y",)), ("ed", ("", "e")),
                              ("es", ("", "e")), ("s", ("",))):
            if w.endswith(suffix) and len(w) > len(suffix) + 2:
                for r in repls:
                    cand = w[: -len(suffix)] + r
                    if cand in VERB_BASE:
                        return cand
                    # doubled final consonant: referred -> refer
                    if len(cand) > 2 and cand[-1] == cand[-2] \
                            and cand[:-1] in VERB_BASE:
                        return cand[:-1]
        return w
    if pos in ("NOUN", "PROPN"):
        if w.endswith("ies") and len(w) > 4:
            return w[:-3] + "y"
        if w.endswith("ses") or w.endswith("xes") or w.endswith("ches") \
                or w.endswith("shes"):
            return w[:-2]
        if w.endswith("s") and not w.endswith("ss") and not w.endswith("us") \
                and not w.endswith("is") and len(w) > 3:
            return w[:-1]
    return w


@lru_cache(maxsize=65536)
def _verb_form(word: str) -> Optional[str]:
    """Return the fine tag if the word is a known verb form, else None."""
    w = word.lower()
    if w in _IRREGULAR_PAST:
        return "VBN"
    if w in VERB_BASE:
        return "VB"
    for suffix, tag in (("ing", "VBG"), ("ied", "VBD"), ("ed", "VBD"),
                        ("ies", "VBZ"), ("es", "VBZ"), ("s", "VBZ")):
        if w.endswith(suffix) and len(w) > len(suffix) + 2:
            for r in ("", "e", "y"):
                cand = w[: -len(suffix)] + r
                if cand in VERB_BASE:
                    return tag
                if len(cand) > 2 and cand[-1] == cand[-2] \
                        and cand[:-1] in VERB_BASE:
                    return tag
    return None


_ADJ_SUFFIX = re.compile(
    r".{2,}(able|ible|ful|ous|ive|al|ic|ary|ory|less|ent|ant)$")
# precompiled hot-loop patterns (module-level re.* re-looks-up the cache
# per call — measurable at ~25k calls/60 docs)
_GENITIVE = re.compile(r"(\w+)([’']s)")
_HAS_WORDCHAR = re.compile(r"\w")
_NUMERIC = re.compile(r"\d+(?:[./]\d+)*")


def tokenize_with_mentions(content: str,
                           mentions: Sequence[Dict]) -> List[Tok]:
    """Tokenize one node's content; mention spans become single REF tokens
    (POS=PROPN, TAG=REF) carrying their resolved targets."""
    toks: List[Tok] = []
    pos_cursor = 0

    def _plain(segment: str, base: int):
        for m in _WORD.finditer(segment):
            w = m.group()
            # split genitive clitic: controller's -> controller + 's
            gen = _GENITIVE.fullmatch(w)
            if gen:
                toks.append(Tok(len(toks), gen.group(1), idx=base + m.start()))
                toks.append(Tok(len(toks), gen.group(2), pos="PART",
                                tag="POS", idx=base + m.start()
                                + len(gen.group(1))))
                continue
            toks.append(Tok(len(toks), w, idx=base + m.start()))

    for mention in sorted(mentions, key=lambda m: m["start"]):
        s, t = mention["start"], mention["text"]
        if s < pos_cursor:
            continue  # overlapping (shouldn't happen: regex is greedy)
        _plain(content[pos_cursor:s], pos_cursor)
        toks.append(Tok(len(toks), t, pos="PROPN", tag="REF", is_ref=True,
                        ref_targets=list(mention.get("targets") or []),
                        idx=s))
        pos_cursor = s + len(t)
    _plain(content[pos_cursor:], pos_cursor)

    # rejoin soft-hyphen line-break fragments ("identifi cation")
    out: List[Tok] = []
    known = VERB_BASE | DET | PRON | ADP | SCONJ | CCONJ | MODALS | BE \
        | HAVE | DO | ADV
    for t in toks:
        if (out and not t.is_ref and not out[-1].is_ref
                and t.text.lower() in _FRAG_SUFFIX
                and out[-1].text.isalpha() and out[-1].text.islower()
                and len(out[-1].text) >= 4
                and out[-1].text.lower() not in known
                and _verb_form(out[-1].text) is None):
            out[-1].text = out[-1].text + t.text
        else:
            out.append(t)
    for k, t in enumerate(out):
        t.i = k
    return out


def tag(toks: List[Tok]) -> None:
    """Lexicon + suffix + context POS tagging (in place)."""
    for k, t in enumerate(toks):
        if t.is_ref or t.tag == "POS":
            continue
        w = t.text
        lw = w.lower()
        prev = toks[k - 1] if k else None
        if not _HAS_WORDCHAR.search(w):
            t.pos, t.tag = "PUNCT", "."
        elif lw in ("out", "up", "down") and prev is not None \
                and prev.pos == "VERB":
            t.pos, t.tag = "ADP", "RP"   # phrasal particle
        elif _NUMERIC.fullmatch(w):
            t.pos, t.tag = "NUM", "CD"
        elif lw == "not":
            t.pos, t.tag = "PART", "RB"
        elif lw == "to":
            t.pos, t.tag = "PART", "TO"   # refined in a second pass
        elif lw in MODALS:
            t.pos, t.tag = "AUX", "MD"
        elif lw in BE or lw in HAVE or lw in DO:
            t.pos, t.tag = "AUX", "VBZ" if lw.endswith("s") else "VB"
            if lw in ("been", "being"):
                t.tag = "VBN" if lw == "been" else "VBG"
        elif lw in DET:
            t.pos, t.tag = "DET", "DT"
        elif lw in PRON:
            t.pos, t.tag = "PRON", "PRP"
        elif lw in CCONJ:
            t.pos, t.tag = "CCONJ", "CC"
        elif lw in SCONJ and lw != "that":
            t.pos, t.tag = "SCONJ", "IN"
        elif lw == "that":
            # clause marker after a verb, determiner otherwise
            t.pos, t.tag = ("SCONJ", "IN") if prev is not None and \
                prev.pos in ("VERB", "AUX") else ("DET", "DT")
        elif lw in ADP:
            t.pos, t.tag = "ADP", "IN"
        elif lw in ADV:
            t.pos, t.tag = "ADV", "RB"
        else:
            vtag = _verb_form(w)
            nxt_w = toks[k + 1].text.lower() if k + 1 < len(toks) else ""
            if vtag == "VBZ" and lw in _PLURAL_NOT_VERB \
                    and nxt_w not in DET:
                # noun reading ("transfers of personal data", "the time
                # limits for", "the records referred to") — but a following
                # determiner starts a direct object, which marks the verbal
                # use ("the controller records each operation").  A bare-
                # noun object ("the regulation limits processing") is still
                # mistagged; see test_annotate_parser.py for the noted gap.
                t.pos, t.tag = "NOUN", "NNS"
            elif vtag is not None:
                t.pos, t.tag = "VERB", vtag
            elif lw.endswith("ly") and len(lw) > 3:
                t.pos, t.tag = "ADV", "RB"
            elif w[0].isupper() and k > 0 and prev is not None \
                    and prev.pos != "PUNCT":
                t.pos, t.tag = "PROPN", "NNP"
            elif _ADJ_SUFFIX.match(lw):
                t.pos, t.tag = "ADJ", "JJ"
            else:
                t.pos = "NOUN"
                t.tag = "NNS" if lw.endswith("s") and not lw.endswith("ss") \
                    else "NN"
        t.lemma = lemmatize(w, t.pos)

    # context refinements
    for k, t in enumerate(toks):
        nxt = toks[k + 1] if k + 1 < len(toks) else None
        prev = toks[k - 1] if k else None
        # base verb after a modal/aux ("shall maintain")
        if t.pos in ("NOUN", "ADJ", "PROPN") and prev is not None and \
                prev.pos in ("AUX", "PART") and prev.tag in ("MD", "TO", "VB") \
                and _verb_form(t.text) is None and t.text.islower() \
                and t.text.isalpha():
            t.pos, t.tag = "VERB", "VB"
            t.lemma = lemmatize(t.text, "VERB")
        # "to" + base verb = infinitival marker, otherwise preposition
        if t.text.lower() == "to":
            nxt_lw = nxt.text.lower() if nxt is not None else ""
            if nxt is not None and (_verb_form(nxt.text) == "VB"
                                    or nxt.pos == "VERB"
                                    or nxt_lw in BE or nxt_lw in HAVE
                                    or nxt_lw in DO):
                t.pos, t.tag = "PART", "TO"
            else:
                t.pos, t.tag = "ADP", "IN"
        # past participle after be/have: VBD -> VBN
        if t.pos == "VERB" and t.tag == "VBD" and prev is not None and \
                prev.pos in ("AUX", "ADV", "PART"):
            j = k - 1
            while j >= 0 and toks[j].pos in ("ADV", "PART"):
                j -= 1
            if j >= 0 and toks[j].pos == "AUX":
                t.tag = "VBN"
        # reduced relative: "-ed" directly followed by a preposition/particle
        # is a participle ("the procedure referred to in ...")
        if t.pos == "VERB" and t.tag == "VBD" and nxt is not None and \
                (nxt.pos == "ADP" or nxt.tag == "TO"):
            t.tag = "VBN"
        # gerund after a preposition/determiner is nominal ("of processing
        # activities")
        if t.pos == "VERB" and t.tag == "VBG" and (
                prev is not None and prev.pos in ("ADP", "DET")):
            t.pos, t.tag = "NOUN", "NN"
            t.lemma = lemmatize(t.text, "NOUN")
        # "including" directly after a verb ("disclosed including
        # recipients") is the preposition sense, not a participial clause
        if t.text.lower() == "including" and t.pos == "VERB" \
                and prev is not None and prev.pos == "VERB":
            t.pos, t.tag = "ADP", "IN"
        # verb form directly after a determiner is a noun ("the record")
        if t.pos == "VERB" and prev is not None and prev.pos == "DET":
            t.pos = "NOUN"
            t.tag = "NNS" if t.text.lower().endswith("s") else "NN"
            t.lemma = lemmatize(t.text, "NOUN")
        # suffix-guessed adjective in subject-head position ("the
        # controller's representative shall ...") is a noun; likewise after
        # a genitive marker ("the processor's representative,")
        if t.pos == "ADJ" and ((nxt is not None and (
                nxt.pos == "AUX" or nxt.tag == "POS"))
                or (prev is not None and prev.tag == "POS")):
            t.pos = "NOUN"
            t.tag = "NNS" if t.text.lower().endswith("s") else "NN"
            t.lemma = lemmatize(t.text, "NOUN")
        # bare verb form directly after a preposition is nominal
        # ("available ... on request")
        if t.pos == "VERB" and t.tag == "VB" and prev is not None \
                and prev.pos == "ADP" and prev.tag == "IN":
            t.pos, t.tag = "NOUN", "NN"
            t.lemma = lemmatize(t.text, "NOUN")



def _mark_list_markers(toks: List[Tok]) -> None:
    """Point/paragraph list markers ``(a)``/``(ii)``/``(1)`` inside running
    text are labels, not noun phrases: tag the inner token LS."""
    for k in range(1, len(toks) - 1):
        t = toks[k]
        if toks[k - 1].text == "(" and toks[k + 1].text == ")" \
                and not t.is_ref and len(t.text) <= 3 \
                and t.text.isalnum():
            t.pos, t.tag = "X", "LS"


_BOUNDARY = {".", "!", "?"}
_MAX_SENT_TOKENS = 300


def split_sentences(toks: List[Tok]) -> List[List[Tok]]:
    """Sentence boundaries at ./!/?; semicolons and colons do NOT split so
    that enumeration lists ("shall contain: (a) ...; (b) ...") stay in one
    analyzed sentence like the reference's doc-level spaCy parse.  Over-long
    runs are force-split at the next punctuation to bound extraction cost."""
    sents, cur = [], []
    for t in toks:
        cur.append(t)
        if t.pos == "PUNCT" and (
                t.text in _BOUNDARY
                or (len(cur) >= _MAX_SENT_TOKENS and t.text in (";", ":"))):
            sents.append(cur)
            cur = []
        elif len(cur) >= 2 * _MAX_SENT_TOKENS:
            sents.append(cur)
            cur = []
    if cur:
        sents.append(cur)
    return sents


_NP_POS = ("DET", "ADJ", "NUM", "NOUN", "PROPN", "PRON")
_NP_HEAD_POS = ("NOUN", "PROPN", "PRON")
_WH_PRON = ("which", "who", "whom")


def _parse_sentence(toks: List[Tok]) -> None:
    """Shallow rule dependency parse (in place, doc-level head indices).

    Passes: NP chunking -> NP conjunction chaining (incl. semicolon+list-
    marker enumerations) -> verb grouping -> acl/relcl classification ->
    per-clause (left to right): clause linking, subject, post-verb
    objects/prepositions.  Produces exactly the dependency surface the
    phrase-extraction rules consume.
    """
    n = len(toks)
    if n == 0:
        return
    base = toks[0].i

    def L(i: int) -> Tok:
        return toks[i]

    # ---- 1. noun-phrase chunking ----
    def _np_member(i: int) -> bool:
        t = L(i)
        if t.pos == "PRON" and t.text.lower() in _WH_PRON:
            return False  # relative pronouns head their own clause
        return t.pos in _NP_POS or t.tag == "POS"

    np_head_of = [None] * n
    np_run_end = [None] * n
    k = 0
    while k < n:
        if _np_member(k):
            j = k
            # a personal pronoun is its own NP ("the processing it carries
            # out" is NP + NP + verb, not one chunk headed by the pronoun)
            if L(k).pos != "PRON":
                while j + 1 < n and _np_member(j + 1) \
                        and L(j + 1).pos != "PRON":
                    j += 1
            h = None
            for m in range(j, k - 1, -1):
                if L(m).pos in _NP_HEAD_POS:
                    h = m
                    break
            if h is None:
                k = j + 1
                continue
            for m in range(k, j + 1):
                np_head_of[m] = h
                np_run_end[m] = j
                if m == h:
                    continue
                t = L(m)
                if t.tag == "POS":
                    t.dep, t.head_i = "case", base + (m - 1 if m else m)
                elif m + 1 <= j and L(m + 1).tag == "POS":
                    # genitive possessor: controller 's representative
                    t.dep, t.head_i = "poss", base + h
                elif t.pos == "DET":
                    t.dep, t.head_i = "det", base + h
                elif t.pos == "ADJ":
                    t.dep, t.head_i = "amod", base + h
                elif t.pos == "NUM":
                    t.dep, t.head_i = "nummod", base + h
                elif m < h:
                    t.dep, t.head_i = "compound", base + h
                else:
                    t.dep, t.head_i = "appos", base + h
            k = j + 1
        else:
            k += 1

    np_heads = sorted({h for h in np_head_of if h is not None})

    # ---- 2. NP conjunction chains ----
    # "A and B" links locally; ";/(b)/," enumeration items link to the
    # chain anchor (first object NP of the clause).  NPs directly followed
    # by a verb are subjects, not list items (unless an explicit CCONJ
    # bound them).
    anchor = None
    prev_head = None
    enum_waiting = False
    first_np = None  # first NP head after the last finite verb
    deferred = None  # coordination suspended across a parenthetical PP
    enum_anchor = None  # NP before a ':' — survives verb resets so that
    # "; (f) ..." items keep conj-linking into the colon enumeration even
    # after an embedded relative clause introduced a verb
    pending = None  # None | ("local"|"anchor"|"enum", cconj_idx|None)
    for k in range(n):
        t = L(k)
        if t.pos in ("VERB", "AUX"):
            anchor = None
            prev_head = None
            pending = None
            first_np = None
            if t.tag not in ("VBN", "VBG"):
                # participles don't close a suspended coordination
                # ("and, in the case of transfers referred to in X, the Y")
                deferred = None
        elif np_head_of[k] == k:
            nxt = np_run_end[k] + 1
            followed_by_verb = nxt < n and L(nxt).pos in ("VERB", "AUX")
            if pending is not None:
                mode, cconj = pending
                target = (prev_head if mode == "local"
                          else anchor if mode == "anchor" else enum_anchor)
                run_start = k
                while run_start - 1 >= 0 \
                        and np_head_of[run_start - 1] == k:
                    run_start -= 1
                if target is not None and mode == "local" \
                        and cconj is not None and cconj == run_start - 1 \
                        and target == run_start - 2 \
                        and L(target).pos == "PROPN" \
                        and not L(target).is_ref and L(k).pos == "NOUN" \
                        and np_run_end[target] == target:
                    # "Union or Member State law": a bare proper-noun
                    # coordinated with the modifier chain of a common-noun
                    # head is itself a modifier, not a conjunct NP
                    L(target).dep, L(target).head_i = "compound", base + k
                    np_head_of[target] = k
                    if L(cconj).dep == "dep":
                        L(cconj).dep = "cc"
                        L(cconj).head_i = base + k
                elif target is not None and \
                        (not followed_by_verb or cconj is not None):
                    t.dep, t.head_i = "conj", base + target
                    if cconj is not None and L(cconj).dep == "dep":
                        L(cconj).dep = "cc"
                        L(cconj).head_i = base + target
            if anchor is None:
                anchor = k
            if enum_waiting:
                # "containing: (a) the name ..." — the first NP after the
                # colon anchors the enumeration
                enum_anchor = k
                enum_waiting = False
            if first_np is None:
                first_np = k
            prev_head = k
            pending = None
        elif t.pos == "CCONJ":
            # "technical and organisational security measures": the CCONJ
            # coordinates attributive adjectives, not NPs
            if k + 1 < n and L(k + 1).pos == "ADJ" \
                    and np_head_of[k + 1] != k + 1 \
                    and k >= 1 and L(k - 1).pos == "ADJ":
                pending = None
            else:
                pending = ("local", k)
        elif t.text == ",":
            if pending is not None and pending[1] is not None \
                    and k + 1 < n and L(k + 1).pos == "ADP":
                # "and, in the case of X, the Y": the coordination is
                # suspended across the parenthetical PP and resumes —
                # coordinating with the clause's first object — at the NP
                # after the closing comma
                deferred = (pending, first_np if first_np is not None
                            else prev_head)
                pending = None
            elif deferred is not None:
                pending, prev_head = deferred
                deferred = None
            elif pending is None:
                pending = ("local", None)
        elif t.text == ":":
            enum_anchor = prev_head
            enum_waiting = prev_head is None
            pending = ("anchor", None)
        elif t.text == ";":
            pending = ("enum", None) if enum_anchor is not None \
                else ("anchor", None)
        elif t.tag == "LS" or t.text in ("(", ")"):
            pass  # enumeration marker: keep pending state
        elif t.pos == "ADP" and pending is not None and pending[1] is not None:
            pass  # coordinated PPs: "of the controller or of the processor"
        elif pending is not None and (
                t.pos in ("ADV",)
                or (t.pos == "SCONJ" and k + 1 < n
                    and L(k + 1).pos in ("ADJ", "ADV"))
                or (t.pos == "ADJ" and k + 1 < n
                    and L(k + 1).pos == "PUNCT")):
            pass  # parenthetical between conjuncts: "and, where applicable,"
        elif np_head_of[k] is not None:
            pass  # inside an NP run
        else:
            pending = None

    # ---- 3. verb groups ----
    groups = []  # dicts: main, auxes, passive, kind
    used = set()
    k = 0
    while k < n:
        if k in used or L(k).pos not in ("AUX", "VERB"):
            k += 1
            continue
        auxes = []
        while k < n and L(k).pos == "AUX":
            auxes.append(k)
            k += 1
            while k < n and L(k).pos in ("ADV", "PART"):
                if L(k).pos == "ADV" and k + 1 < n and L(k + 1).tag == "TO":
                    # "is likely to result": the adjective/adverb breaks
                    # the aux chain — 'result' starts its own xcomp clause
                    break
                k += 1
        if k < n and L(k).pos == "VERB" and np_head_of[k] is None:
            main = k
        elif auxes:
            main = auxes.pop()
        else:
            if k < n and L(k).pos == "VERB" and np_head_of[k] is None:
                main = k
            else:
                k += 1
                continue
        passive = L(main).tag == "VBN" and any(
            L(a).lemma == "be" for a in auxes)
        groups.append({"main": main, "auxes": auxes, "passive": passive,
                       "kind": None, "start": auxes[0] if auxes else main})
        used.update(auxes)
        used.add(main)
        k = max(k, main) + 1

    if not groups:
        root_local = np_heads[0] if np_heads else 0
        root = L(root_local)
        root.dep, root.head_i = "ROOT", base + root_local
        for t in toks:
            if t.dep == "dep" and t.i != base + root_local:
                t.head_i = base + root_local
        return

    # ---- 4. acl / relcl classification ----
    def _is_list_boundary(lo: int, hi: int) -> bool:
        """True if a ';'/':'/list-marker separates positions lo < hi."""
        for m in range(lo + 1, hi):
            if L(m).text in (";", ":") or L(m).tag == "LS":
                return True
        return False

    def _climb_nominal(idx: int) -> int:
        """Head of the nominal chain containing idx: '... a record of all
        categories of processing activities carried out on behalf of a
        controller, containing' — the participle after the comma modifies
        'record', the top of the pobj/prep/acl chain, like spaCy's
        long-distance acl attachment.  conj hops stop at list boundaries
        so enumeration items keep their own head."""
        cur = idx
        for _ in range(n):
            t = L(cur)
            if t.dep == "conj":
                h = t.head_i - base
                if 0 <= h < n and not _is_list_boundary(
                        min(h, cur), max(h, cur)):
                    cur = h
                    continue
                break
            if t.dep == "pobj":
                prep = t.head_i - base
                if 0 <= prep < n:
                    h = L(prep).head_i - base
                    if 0 <= h < n and h != prep:
                        ht = L(h)
                        if ht.pos in ("NOUN", "PROPN"):
                            cur = h
                            continue
                        if ht.pos == "VERB" and ht.dep == "acl":
                            hh = ht.head_i - base
                            if 0 <= hh < n and \
                                    L(hh).pos in ("NOUN", "PROPN"):
                                cur = hh
                                continue
            break
        return cur

    for g in groups:
        main, auxes = g["main"], g["auxes"]
        if not auxes and L(main).tag in ("VBN", "VBG"):
            j = main - 1
            while j >= 0 and (L(j).pos == "ADV"
                              or L(j).text.lower() == "as"):
                j -= 1
            if j >= 0 and np_head_of[j] is not None:
                g["kind"] = "acl"
                L(main).dep = "acl"
                head = np_head_of[j]
                if j < main - 1:
                    # "categories of data as referred to": climb out of
                    # the pobj chain to the head the clause modifies
                    g["climb_from"] = head
                elif L(main).tag == "VBN":
                    if L(head).dep == "conj":
                        # "convictions and offences referred to in
                        # Article 10": the participle modifies the whole
                        # coordination
                        climbed = False
                        while L(head).dep == "conj":
                            h2 = L(head).head_i - base
                            if not (0 <= h2 < n) or h2 == head \
                                    or _is_list_boundary(min(h2, head),
                                                         max(h2, head)):
                                break
                            head = h2
                            climbed = True
                        L(main).acl_coord = climbed
                    else:
                        # "description of the ... measures referred to":
                        # climb one pobj hop when it lands on an
                        # enumeration-item head (refined after step 5)
                        g["climb_from"] = head
                        g["climb_direct"] = True
                L(main).head_i = base + head
                continue
            # participial clause set off by a comma attaches to the head
            # of the preceding nominal chain ("a record of ..., containing");
            # the chain head is refined after step 5 assigns pobj/prep deps
            if j >= 0 and L(j).text == "," and j >= 1 \
                    and np_head_of[j - 1] is not None:
                g["kind"] = "acl"
                g["climb_from"] = np_head_of[j - 1]
                L(main).dep = "acl"
                L(main).head_i = base + np_head_of[j - 1]
                continue
        # "..., who has ..." / "which shall ..." / "to whom the data have ..."
        j = g["start"] - 1
        while j >= 0 and L(j).pos in ("ADV", "PUNCT"):
            j -= 1
        # the relative pronoun may sit before the clause's subject NP
        skipped_subject = False
        skipped_was_pron = False
        if j >= 0 and np_head_of[j] is not None \
                and not (L(j).pos == "PRON"
                         and L(j).text.lower() in _WH_PRON):
            run_head = np_head_of[j]
            skipped_was_pron = L(run_head).pos == "PRON"
            while j >= 0 and np_head_of[j] == run_head:
                j -= 1
            while j >= 0 and L(j).pos in ("ADV", "PUNCT"):
                j -= 1
            skipped_subject = True
        wh = None
        if j >= 0 and L(j).pos == "PRON" and L(j).text.lower() in _WH_PRON:
            wh = j
        if wh is not None:
            jj = wh - 1
            while jj >= 0 and L(jj).pos in ("PUNCT", "ADP"):
                jj -= 1
            if jj >= 0 and np_head_of[jj] is not None:
                g["kind"] = "relcl"
                L(main).dep = "relcl"
                L(main).head_i = base + np_head_of[jj]
                if not skipped_subject:
                    # "who has ...": the pronoun is the clause subject;
                    # "to whom the data have ...": the clause has its own
                    # subject and the pronoun stays a dangling oblique
                    L(wh).dep = "nsubjpass" if g["passive"] else "nsubj"
                    L(wh).head_i = base + main
        elif skipped_was_pron and j >= 0 and np_head_of[j] is not None:
            # zero-relativizer relative clause: "the processing it carries
            # out" — NP + personal-pronoun subject + finite verb
            g["kind"] = "relcl"
            L(main).dep = "relcl"
            L(main).head_i = base + np_head_of[j]

    unclassified = [g for g in groups if g["kind"] is None]
    root_main = unclassified[0]["main"] if unclassified else groups[0]["main"]
    if unclassified:
        unclassified[0]["kind"] = "root"
        rt = L(root_main)
        rt.dep, rt.head_i = "ROOT", base + root_main

    mains = [g["main"] for g in groups]
    starts = [g["start"] for g in groups]

    # aux / neg attachment
    for g in groups:
        main, auxes = g["main"], g["auxes"]
        for a in auxes:
            L(a).dep = "auxpass" if (g["passive"] and L(a).lemma == "be"
                                     and a == auxes[-1]) else "aux"
            L(a).head_i = base + main
    for k in range(n):
        t = L(k)
        if t.text.lower() == "not":
            nxt_main = next((m for m in mains if m >= k), None)
            if nxt_main is None:
                # "… is not occasional.": negation after the clause's verb
                nxt_main = max((m for m in mains if m < k), default=None)
            if nxt_main is not None:
                t.dep, t.head_i = "neg", base + nxt_main
        elif t.pos == "PART" and t.tag == "TO":
            nxt_main = next((m for m in mains if m >= k), None)
            if nxt_main is not None:
                t.dep, t.head_i = "aux", base + nxt_main

    # ---- 5. per clause, in textual order ----
    for gi, g in enumerate(groups):
        main, auxes, passive = g["main"], g["auxes"], g["passive"]
        start = g["start"]
        prev_unclassified = max(
            (h["main"] for h in groups[:gi]
             if (h["kind"] in ("root", None)
                 or h["kind"] not in ("acl", "relcl"))
             and L(h["main"]).dep != "xcomp"),
            default=None)
        prev_any = max((m for m in mains if m < main), default=None)

        # clause linking for plain subordinate/coordinate clauses
        marker_j = None
        if g["kind"] is None:
            j = start - 1
            # skip over this clause's subject NP if directly adjacent
            cand_subj = [h for h in np_heads
                         if (prev_any if prev_any is not None else -1) < h
                         < start and L(h).dep == "dep"]
            if cand_subj and np_run_end[cand_subj[-1]] is not None:
                j = cand_subj[-1]
                while j - 1 >= 0 and np_head_of[j - 1] == cand_subj[-1]:
                    j -= 1
                j -= 1
            else:
                # "unless the processing it carries out is likely": the
                # subject of this clause sits BEFORE the embedded relative
                # clause — skip back over the relcl and its host NP run,
                # but only when a subordinator is found there (otherwise
                # e.g. "have been or will be disclosed" keeps its local
                # coordination)
                prev_g = next((h for h in reversed(groups[:gi])
                               if h["main"] < main), None)
                if prev_g is not None and prev_g["kind"] == "relcl" \
                        and prev_g["start"] <= j + 1:
                    host = L(prev_g["main"]).head_i - base
                    if 0 <= host < n and np_head_of[host] is not None:
                        j2 = host
                        while j2 - 1 >= 0 \
                                and np_head_of[j2 - 1] == np_head_of[host]:
                            j2 -= 1
                        j2 -= 1
                        lo2 = j2
                        while j2 >= 0 and L(j2).pos in ("ADV", "PUNCT"):
                            j2 -= 1
                        if j2 >= 0 and L(j2).pos == "SCONJ":
                            j = j2
                            g["subject_lo"] = lo2
            while j >= 0 and L(j).pos in ("ADV", "PUNCT"):
                j -= 1
            linked = False
            if j >= 0:
                t = L(j)
                if t.pos == "SCONJ":
                    t.dep, t.head_i = "mark", base + main
                    marker_j = j
                    if prev_unclassified is not None:
                        L(main).dep = "ccomp" if t.text.lower() == "that" \
                            else "advcl"
                        L(main).head_i = base + prev_unclassified
                        linked = True
                elif t.pos == "CCONJ":
                    marker_j = j
                    # "have been or will be disclosed": a coordinated verb
                    # directly after an acl/relcl group (no NP between)
                    # conjoins with that group, not with the main clause
                    prev_g = next((h for h in reversed(groups[:gi])
                                   if h["main"] < main), None)
                    if prev_g is not None \
                            and prev_g["kind"] in ("acl", "relcl") \
                            and not any(np_head_of[m] == m for m in
                                        range(prev_g["main"] + 1, start)):
                        t.dep, t.head_i = "cc", base + prev_g["main"]
                        L(main).dep = "conj"
                        L(main).head_i = base + prev_g["main"]
                        linked = True
                    elif prev_unclassified is not None:
                        t.dep, t.head_i = "cc", base + prev_unclassified
                        L(main).dep = "conj"
                        L(main).head_i = base + prev_unclassified
                        linked = True
                elif t.pos == "PART" and t.tag == "TO" \
                        and prev_any is not None:
                    marker_j = j
                    L(main).dep = "xcomp"
                    L(main).head_i = base + prev_any
                    linked = True
            if not linked and prev_unclassified is not None:
                L(main).dep = "advcl"
                L(main).head_i = base + prev_unclassified
            elif not linked and prev_any is not None \
                    and L(main).dep == "dep":
                L(main).dep = "advcl"
                L(main).head_i = base + prev_any

        # subject (acl clauses borrow their head via is_acl_without_subj);
        # the root looks back over the whole sentence, subordinate clauses
        # only past their own marker (no stealing from earlier clauses)
        if g["kind"] != "acl" and not any(
                c.dep in ("nsubj", "nsubjpass", "expl")
                for c in (L(m) for m in range(n))
                if c.head_i == base + main):
            if g["kind"] == "root":
                lo = -1
            elif g.get("subject_lo") is not None:
                lo = g["subject_lo"]
            else:
                lo = prev_any if prev_any is not None else -1
                if marker_j is not None:
                    lo = max(lo, marker_j)
            cand = [h for h in np_heads if lo < h < start
                    and L(h).dep == "dep"]
            if cand:
                s = cand[-1]
                L(s).dep = "nsubjpass" if passive else "nsubj"
                if L(s).text.lower() == "there":
                    L(s).dep = "expl"
                L(s).head_i = base + main

        # post-verb attachments up to the next group's clause start
        end = starts[gi + 1] if gi + 1 < len(groups) else n
        last_nominal = None
        k = main + 1
        while k < end:
            t = L(k)
            if t.pos == "SCONJ" and k + 1 < end and L(k + 1).pos == "ADP":
                # prepositional subordinator ("except on instructions"):
                # mark on the verb, keep scanning the PP
                if t.dep == "dep":
                    t.dep, t.head_i = "mark", base + main
                k += 1
                continue
            if t.pos == "SCONJ" and k + 1 < end \
                    and L(k + 1).pos in ("ADJ", "ADV") \
                    and (k + 2 >= end or L(k + 2).pos == "PUNCT"):
                # parenthetical "where applicable," — not a clause start
                k += 2
                continue
            if t.pos == "SCONJ" or (t.pos == "CCONJ" and t.dep == "dep") \
                    or (t.pos == "PRON" and t.text.lower() in _WH_PRON):
                break
            if t.text == "," and k + 1 < end:
                # ", the processing is ..." — the NP after this comma is
                # the NEXT clause's subject, not more objects of this one
                jj = k + 1
                if np_head_of[jj] is not None:
                    run = np_head_of[jj]
                    jj = np_run_end[run] + 1 if np_run_end[run] is not None \
                        else jj + 1
                    if jj < n and L(jj).pos in ("VERB", "AUX"):
                        break
            if t.pos == "ADJ" and t.dep == "dep" and (
                    k == main + 1
                    or (k == main + 2 and L(k - 1).dep == "neg")):
                # predicate adjective: "is likely", "is not occasional"
                t.dep, t.head_i = "acomp", base + main
            elif t.pos == "ADV" and t.dep == "dep" and k == main + 1 \
                    and L(main).lemma == "be":
                t.dep, t.head_i = "advmod", base + main
            if np_head_of[k] == k and t.dep == "dep":
                t.dep = "attr" if L(main).lemma == "be" else "dobj"
                t.head_i = base + main
                last_nominal = k
            elif t.pos == "ADP" and t.tag == "RP":
                t.dep, t.head_i = "prt", base + main
            elif t.pos == "ADP" and t.dep == "dep":
                is_agent = L(main).tag == "VBN" and t.text.lower() == "by"
                agent_host = main
                head_local = L(main).head_i - base
                if not is_agent and t.text.lower() == "by" \
                        and 0 <= head_local < n and head_local != main \
                        and L(head_local).tag == "VBN":
                    # "required to do so by ..." — the by-agent belongs to
                    # the governing passive participle
                    is_agent = True
                    agent_host = head_local
                host, hdep = ((agent_host, "agent") if is_agent
                              else (main, "prep"))
                prev_k = k - 1
                if not is_agent and prev_k > main \
                        and np_head_of[prev_k] is not None \
                        and L(np_head_of[prev_k]).dep != "dep":
                    host, hdep = np_head_of[prev_k], "prep"
                t.dep, t.head_i = hdep, base + host
                j = k + 1
                while j < end and L(j).pos not in ("VERB", "AUX", "ADP") \
                        and np_head_of[j] != j:
                    j += 1
                if j < end and np_head_of[j] == j and L(j).dep == "dep":
                    L(j).dep, L(j).head_i = "pobj", base + k
                    last_nominal = j
            k += 1

    # refine comma-acl attachment now that pobj/prep chains exist
    for g in groups:
        if g.get("climb_from") is not None:
            top = _climb_nominal(g["climb_from"])
            if g.get("climb_direct"):
                # adjacent participle: hop a single pobj link only when it
                # lands on an enumeration conjunct NP
                h0 = g["climb_from"]
                t0 = L(h0)
                if t0.dep == "pobj":
                    prep = t0.head_i - base
                    host = L(prep).head_i - base if 0 <= prep < n else -1
                    if 0 <= host < n and L(host).pos == "NOUN" \
                            and L(host).dep == "conj":
                        L(g["main"]).head_i = base + host
                continue
            t = L(top)
            if t.dep == "pobj":
                prep = t.head_i - base
                vh = L(prep).head_i - base if 0 <= prep < n else -1
                if 0 <= vh < n and L(vh).pos in ("VERB", "AUX") \
                        and L(vh).dep != "acl":
                    # "shall be in writing, including in electronic form":
                    # the participle modifies the clause, not the noun
                    L(g["main"]).dep = "advcl"
                    L(g["main"]).head_i = base + vh
                    continue
            L(g["main"]).head_i = base + top

    # comma-separated clause lists: "X is likely ..., Y is not occasional,
    # or Z includes ..." — when a later clause conj-links to an advcl
    # clause of the same head, the advcl is really the first conjunct
    for g2 in groups:
        m2 = g2["main"]
        if L(m2).dep != "conj":
            continue
        h = L(m2).head_i - base
        g1 = next((g for g in groups if g["main"] == h), None)
        if g1 is not None and L(h).dep == "advcl" \
                and any(L(m).text == "," for m in
                        range(g1["start"] - 3, g1["start"]) if 0 <= m < n):
            L(h).dep = "conj"

    # an NP conjoined to a pobj inside a participial clause really
    # coordinates with the clause's host nominal: "special categories of
    # data as referred to in Article 9(1) or personal data relating ..."
    for k in range(n):
        t = L(k)
        if t.dep != "conj":
            continue
        h = t.head_i - base
        if not (0 <= h < n) or L(h).dep != "pobj" or not L(h).is_ref:
            continue
        prep = L(h).head_i - base
        if not (0 <= prep < n) or L(prep).dep not in ("prep", "agent"):
            continue
        v = L(prep).head_i - base
        if not (0 <= v < n) or L(v).pos != "VERB" or L(v).dep != "acl":
            continue
        host = L(v).head_i - base
        if 0 <= host < n and L(host).pos in ("NOUN", "PROPN"):
            t.head_i = base + _climb_nominal(host)

    # parenthetical "where applicable/possible," at an enumeration-item
    # start acts as the conditional marker of the item's participial
    # clause: attach the SCONJ as mark to the item's VBN group (matching
    # spaCy's observed attachment on the reference corpus)
    for k in range(n):
        t = L(k)
        if t.pos == "SCONJ" and t.dep == "dep" \
                and t.text.lower() in ("where", "when", "if", "unless",
                                       "while") \
                and k + 2 < n and L(k + 1).pos in ("ADJ", "ADV") \
                and L(k + 2).pos == "PUNCT" \
                and k >= 1 and (L(k - 1).text in (")", ";", ":")
                                or L(k - 1).tag == "LS"):
            item_end = next((m for m in range(k + 1, n)
                             if L(m).text == ";"), n)
            host = next((g["main"] for g in groups
                         if k < g["main"] < item_end
                         and L(g["main"]).tag == "VBN"), None)
            if host is not None:
                t.dep, t.head_i = "mark", base + host

    # leftovers dangle from the root
    for t in toks:
        if t.dep == "dep" and t.i != base + root_main:
            t.head_i = base + root_main


_SING_PRON = {"it", "itself"}
_PLUR_PRON = {"they", "them", "themselves"}


def resolve_coref(doc: List[Tok]) -> None:
    """Nearest-antecedent pronoun resolution (coreferee stand-in): ``it``
    -> last singular NOUN subject/object before it, ``they/them`` -> last
    plural; subjects preferred."""
    seen: List[Tuple[Tok, bool]] = []
    for t in doc:
        lw = t.text.lower()
        if t.pos == "PRON" and (lw in _SING_PRON or lw in _PLUR_PRON):
            want_plural = lw in _PLUR_PRON
            # "the processing it carries out": the relative clause's own
            # host noun is not an antecedent candidate for its subject
            skip_i = None
            if t.head is not None and t.head.dep == "relcl" \
                    and t.head.head is not None:
                skip_i = t.head.head.i
            match = None
            for cand, is_subj in reversed(seen):
                if cand.i == skip_i:
                    continue
                if (cand.tag == "NNS") == want_plural:
                    # subjects are preferred antecedents, but only within
                    # the pronoun's own sentence — a subject three
                    # sentences back does not outrank a nearby object
                    if is_subj and cand.sent is t.sent:
                        match = cand
                        break
                    if match is None:
                        match = cand
            if match is not None:
                # a coordinated antecedent resolves to the whole
                # coordination ("an enterprise or an organisation ... it")
                chain = [match]
                root = match
                while root.dep == "conj" and root.head is not None \
                        and root.head.pos in ("NOUN", "PROPN") \
                        and root.head is not root:
                    root = root.head
                if root is not match:
                    chain = [root]
                stack = [root]
                while stack:
                    cur = stack.pop()
                    for c in cur.rights:
                        if c.dep == "conj" and c.pos in ("NOUN", "PROPN") \
                                and c not in chain:
                            chain.append(c)
                            stack.append(c)
                t.coref = sorted({c.i for c in chain})
        elif t.pos in ("NOUN", "PROPN") and not t.is_ref \
                and t.dep in ("nsubj", "nsubjpass", "dobj", "attr", "pobj",
                              "conj"):
            seen.append((t, t.dep in ("nsubj", "nsubjpass")))


def annotate_text(content: str, mentions: Sequence[Dict]) -> List[Sent]:
    """Full annotation of a text (node content or a whole document's
    extracted text) -> sentence list."""
    toks = tokenize_with_mentions(content or "", mentions or [])
    tag(toks)
    _mark_list_markers(toks)
    sent_toks = split_sentences(toks)
    for st in sent_toks:
        _parse_sentence(st)
    sents = make_doc(sent_toks)
    doc = [t for s in sents for t in s]
    index_children(doc)
    resolve_coref(doc)
    return sents


#: backwards-compatible alias (per-node annotation is the same operation)
annotate_node = annotate_text
