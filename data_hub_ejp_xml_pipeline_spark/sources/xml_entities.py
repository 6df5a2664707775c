"""Reference-parity entity extraction from EJP XML documents.

Pure-Python (runs inside the Arrow-batched ``mapInPandas`` parser of
``sources.xml_zip``) re-implementation of the reference's per-node
transforms, written from scratch against observed behavior:

* person (manuscript XML ``people/person``) —
  ``transform_zip_xml/ejp_manuscript_xml.py:142-186``
* person_v2 (persons XML ``person``, with node_index provenance) —
  ``transform_zip_xml/ejp_person_xml.py:154-226``
* manuscript — ``ejp_manuscript_xml.py:189-204``
* manuscript_version (dual-spelling unions for referees/reviewers,
  editors/reviewing-editors, potential-*) —
  ``ejp_manuscript_xml.py:434-546``

Timestamps follow ``utils/xml_transform_util/timestamp.py:11-31``: naive
wall times are US/Eastern, rendered ISO-8601 UTC with a ``Z`` suffix.
Text extraction follows ``utils/xml_transform_util/xml.py:25-60``:
``itertext()`` join, HTML-entity decode, ``None`` for a missing child vs
``''`` for an empty one.

Divergence (documented): the reference stamps every payload with a
wall-clock ``imported_timestamp`` (``ejp_zip.py:57``). This engine's
provenance carries only deterministic fields (source_filename,
node_index) so that replaying a checkpoint regenerates byte-identical
payloads — the exactly-once contract of the snapshot table.
"""

from __future__ import annotations

import html
import re
import xml.etree.ElementTree as ET
from datetime import datetime, timezone
from typing import Any, Callable, Iterator

import dateutil.parser
import pytz

GENERATED_PERSON_ID_PREFIX = "generated-"
INITIAL_SUBMISSION_TYPE_PREFIX = "Initial Submission:"
OVERALL_STAGE_INITIAL = "Initial Submission"
OVERALL_STAGE_FULL = "Full Submission"

_EASTERN = pytz.timezone("US/Eastern")
_MANUSCRIPT_NO_RE = re.compile(r".*e[Ll]ife.*-(\d{5,6})")


# ------------------------------------------------------------- timestamps


def parse_timestamp(timestr: str) -> datetime:
    """dateutil parse; naive wall times are US/Eastern → UTC
    (timestamp.py:11-17)."""
    ts = dateutil.parser.parse(timestr)
    if ts.tzinfo is None:
        ts = _EASTERN.localize(ts).astimezone(timezone.utc)
    return ts


def format_iso(timestamp_or_str: datetime | str) -> str:
    ts = (
        timestamp_or_str
        if isinstance(timestamp_or_str, datetime)
        else parse_timestamp(timestamp_or_str)
    )
    return ts.isoformat().replace("+00:00", "Z")


def format_optional_iso(timestr: str | None) -> str | None:
    return format_iso(timestr) if timestr else None


def format_iso_with_fallback(primary: str | None, fallback: str | None) -> str | None:
    """``format_iso(primary or fallback)``, but a fully-absent timestamp
    yields None instead of raising: the reference can assume go.xml's
    create_date always exists (ejp_zip.py:57-58 hard-requires it); this
    engine also ingests manifest-less zips, where quarantining every
    person for a missing document timestamp would be wrong."""
    value = primary or fallback
    return format_iso(value) if value else None


# ------------------------------------------------------- text extraction


def decode_entities(text: str | None) -> str | None:
    return html.unescape(text) if text else text


def node_text(node: ET.Element, default: str = "") -> str:
    txt = "".join(node.itertext())
    return txt if txt else default


def decoded_node_text(node: ET.Element, default: str = "") -> str:
    return decode_entities(node_text(node, default))


def child_text(parent: ET.Element, path: str, default: Any = None) -> Any:
    """Missing child → ``default`` (None); present-but-empty child → ``''``
    (xml.py:41-60 — the distinction drives ``or``-fallback chains)."""
    child = parent.find(path)
    if child is None:
        return default
    return decode_entities(node_text(child, default=""))


def extract_list(
    parent: ET.Element, path: str, fn: Callable[[ET.Element], Any]
) -> list:
    return [fn(node) for node in parent.findall(path)]


# ---------------------------------------------------------- scalar codecs


def to_bool(s: str | None) -> bool | None:
    if s == "true":
        return True
    if s == "false":
        return False
    return None


def to_int(s: str | None) -> int | None:
    return int(s) if s else None


def parse_yes_no(s: str | None) -> bool | None:
    if not s:
        return None
    low = s.lower()
    if low == "yes":
        return True
    if low == "no":
        return False
    return None


# --------------------------------------------------------- person_v2 bits


def _v2_membership(node: ET.Element) -> dict:
    """ejp_person_xml.py:41-60."""
    return {
        "is_enabled": node.attrib["active_ind"] == "1",
        "reference_type": node.attrib["member_id_type_cde"],
        "reference_value": child_text(node, "member_id"),
        "start_timestamp": format_optional_iso(child_text(node, "start_dt")),
        "end_timestamp": format_optional_iso(child_text(node, "end_dt")),
        "modified_timestamp": format_optional_iso(child_text(node, "last_update_dt")),
        "modified_by_person_id": child_text(node, "last_update_p_id"),
    }


def _v2_role(node: ET.Element) -> dict:
    """ejp_person_xml.py:63-79."""
    return {
        "role_name": node.attrib["role_nm"],
        "is_enabled": node.attrib["active_ind"] == "1",
        "start_timestamp": format_optional_iso(node.attrib.get("start_dt")),
        "end_timestamp": format_optional_iso(node.attrib.get("end_dt")),
        "modified_timestamp": format_optional_iso(child_text(node, "update_dt")),
        "modified_by_person_id": child_text(node, "update_p_id"),
    }


def _v2_address(node: ET.Element) -> dict:
    """ejp_person_xml.py:82-112 — the 17-field address."""
    return {
        "is_enabled": node.attrib["active_ind"] == "1",
        "address_type": node.attrib.get("addr_type"),
        "country": child_text(node, "country"),
        "area": child_text(node, "state"),
        "city": child_text(node, "city"),
        "postal_code": child_text(node, "zip"),
        "organization": child_text(node, "organization"),
        "department": child_text(node, "department"),
        "division": child_text(node, "division"),
        "laboratory": child_text(node, "laboratory"),
        "job_title": child_text(node, "job_title"),
        "email": child_text(node, "e_mail"),
        "telephone": child_text(node, "telephone"),
        "address_line_1": child_text(node, "addr1"),
        "address_line_2": child_text(node, "addr2"),
        "address_line_3": child_text(node, "addr3"),
        "start_timestamp": format_optional_iso(child_text(node, "start_dt")),
        "end_timestamp": format_optional_iso(child_text(node, "end_dt")),
    }


def _v2_dna(node: ET.Element) -> dict:
    """ejp_person_xml.py:115-129."""
    return {
        "start_timestamp": format_optional_iso(child_text(node, "dna-start-date")),
        "end_timestamp": format_optional_iso(child_text(node, "dna-end-date")),
    }


def _v2_organization(node: ET.Element) -> dict:
    """ejp_person_xml.py:132-139."""
    return {
        "organization_id": child_text(node, "org-id"),
        "organization_name": child_text(node, "org-name"),
        "organization_type": child_text(node, "org-type"),
    }


def generate_person_id(source_filename: str, node_index: int) -> str:
    return f"{GENERATED_PERSON_ID_PREFIX}{source_filename}-{node_index}"


def person_v2_dict(
    node: ET.Element,
    node_index: int,
    modified_timestamp_str: str,
    source_filename: str,
) -> dict:
    """Full PersonV2 payload (ejp_person_xml.py:154-226)."""
    person_id = child_text(node, "person-id") or generate_person_id(
        source_filename, node_index
    )
    return {
        "provenance": {
            "source_filename": source_filename,
            "node_index": node_index,
        },
        "person_id": person_id,
        "modified_timestamp": format_iso_with_fallback(
            child_text(node, "profile-modify-date"), modified_timestamp_str
        ),
        "status": child_text(node, "status"),
        "title": child_text(node, "title"),
        "first_name": child_text(node, "first-name"),
        "middle_name": child_text(node, "middle_nm"),
        "last_name": child_text(node, "last-name"),
        "native_name": child_text(node, "native_nm"),
        "institution": child_text(node, "institution"),
        "email": child_text(node, "email"),
        "secondary_email": child_text(node, "secondary-email"),
        "external_references": extract_list(
            node, "memberships/membership", _v2_membership
        ),
        "addresses": extract_list(node, "addresses/address", _v2_address),
        "organizations": extract_list(
            node, "organizations/organization", _v2_organization
        ),
        "roles": extract_list(node, "roles/role", _v2_role),
        "dates_not_available": extract_list(
            node, "dates-not-available/dna", _v2_dna
        ),
        "keywords": extract_list(node, "keywords/keyword", decoded_node_text),
        "person_tags": extract_list(
            node, "person-tags/person-tag", decoded_node_text
        ),
        "merged_into_person_ids": extract_list(
            node, "merge-info/merged-into-person-id", decoded_node_text
        ),
        "research_organisms": extract_list(
            node,
            'subject-area-list[@name="Research Organism(s)"]/subject-area',
            decoded_node_text,
        ),
        "subject_areas": extract_list(
            node,
            'subject-area-list[@name="Major Subject Area(s)"]/subject-area',
            decoded_node_text,
        ),
    }


# --------------------------------------------- manuscript-side person bits


def _ms_membership(node: ET.Element) -> dict:
    """ejp_manuscript_xml.py:92-100."""
    return {
        "reference_type": child_text(node, "member-type"),
        "reference_value": child_text(node, "member-id"),
    }


def _ms_role(node: ET.Element) -> dict:
    """ejp_manuscript_xml.py:103-106."""
    return {"role_name": child_text(node, "role-type")}


def _ms_address(node: ET.Element) -> dict:
    """ejp_manuscript_xml.py:109-139."""
    return {
        "address_type": child_text(node, "address-type"),
        "country": child_text(node, "address-country"),
        "area": child_text(node, "address-state-province"),
        "city": child_text(node, "address-city"),
        "postal_code": child_text(node, "address-zip-postal-code"),
        "department": child_text(node, "address-department"),
        "address_line_1": child_text(node, "address-street-address-1"),
        "address_line_2": child_text(node, "address-street-address-2"),
        "start_timestamp": format_optional_iso(
            child_text(node, "address-start-date")
        ),
        "end_timestamp": format_optional_iso(child_text(node, "address-end-date")),
    }


def manuscript_person_dict(
    node: ET.Element, modified_timestamp_str: str, source_filename: str
) -> dict:
    """Person payload from manuscript XML (ejp_manuscript_xml.py:142-186)."""
    return {
        "provenance": {"source_filename": source_filename},
        "person_id": child_text(node, "person-id"),
        "modified_timestamp": format_iso_with_fallback(
            child_text(node, "profile-modify-date"), modified_timestamp_str
        ),
        "title": child_text(node, "title"),
        "first_name": child_text(node, "first-name"),
        "middle_name": child_text(node, "middle-name"),
        "last_name": child_text(node, "last-name"),
        "institution": child_text(node, "institution"),
        "email": child_text(node, "email"),
        "secondary_email": child_text(node, "secondary_email"),
        "external_references": extract_list(
            node, "memberships/membership", _ms_membership
        ),
        "roles": extract_list(node, "roles/role", _ms_role),
        "addresses": extract_list(node, "addresses/address", _ms_address),
    }


# ------------------------------------------------------ manuscript/version


def manuscript_number_to_manuscript_id(manuscript_number: str) -> str:
    """ejp_manuscript_xml.py:71-85 (fallback to the full number)."""
    if not manuscript_number.strip():
        raise ValueError("manuscript number must not be empty")
    m = _MANUSCRIPT_NO_RE.match(manuscript_number)
    return m.group(1) if m else manuscript_number


def filename_to_manuscript_number(filename: str) -> str:
    stem = filename.rsplit("/", 1)[-1]
    return stem.rsplit(".", 1)[0] if "." in stem else stem


def manuscript_id_and_number(
    version_node: ET.Element, source_filename: str
) -> tuple[str, str]:
    """ejp_manuscript_xml.py:232-250 — filename-stem fallback chain."""
    number = child_text(version_node, "manuscript-number") or ""
    try:
        return manuscript_number_to_manuscript_id(number), number
    except ValueError:
        number = filename_to_manuscript_number(source_filename)
        return manuscript_number_to_manuscript_id(number), number


def split_manuscript_type(full_type: str) -> tuple[str, str]:
    """ejp_manuscript_xml.py:219-229 — 'Initial Submission:' prefix split."""
    if full_type.startswith(INITIAL_SUBMISSION_TYPE_PREFIX):
        return (
            OVERALL_STAGE_INITIAL,
            full_type[len(INITIAL_SUBMISSION_TYPE_PREFIX):].strip(),
        )
    return OVERALL_STAGE_FULL, full_type


def derive_version_id(manuscript_id: str, created_timestamp: str | None) -> str:
    """ejp_manuscript_xml.py:425-431 (incl. the 'NotAcceptable' literal)."""
    if not created_timestamp:
        return f"NotAcceptable {manuscript_id}/{created_timestamp}"
    return f"{manuscript_id}/{created_timestamp}"


def _stage(node: ET.Element) -> dict:
    """ejp_manuscript_xml.py:207-216."""
    return {
        "stage_timestamp": format_iso(child_text(node, "start-date")),
        "stage_name": child_text(node, "stage-name"),
        "person_id": child_text(node, "stage-affective-person-id"),
    }


def _author(node: ET.Element) -> dict:
    """ejp_manuscript_xml.py:253-264."""
    return {
        "person_id": child_text(node, "author-person-id"),
        "sequence": to_int(child_text(node, "author-seq")),
        "is_corresponding_author": to_bool(child_text(node, "is-corr")),
    }


def _reviewer(node: ET.Element, prefix: str) -> dict:
    """ejp_manuscript_xml.py:267-297."""
    return {
        "person_id": child_text(node, prefix + "person-id"),
        "sequence": to_int(child_text(node, prefix + "sequence")),
        "started_timestamp": format_optional_iso(
            child_text(node, prefix + "started-date")
        ),
        "due_timestamp": format_optional_iso(child_text(node, prefix + "due-date")),
        "next_chase_timestamp": format_optional_iso(
            child_text(node, prefix + "next-chase-date")
        ),
        "received_timestamp": format_optional_iso(
            child_text(node, prefix + "received-date")
        ),
    }


def _reviewing_editor(node: ET.Element, prefix: str) -> dict:
    """ejp_manuscript_xml.py:300-320."""
    return {
        "person_id": child_text(node, prefix + "person-id"),
        "assigned_timestamp": format_optional_iso(
            child_text(node, prefix + "assigned-date")
        ),
        "due_timestamp": format_optional_iso(
            child_text(node, prefix + "decision-due-date")
        ),
    }


def _senior_editor(node: ET.Element) -> dict:
    """ejp_manuscript_xml.py:323-333."""
    return {
        "person_id": child_text(node, "senior-editor-person-id"),
        "assigned_timestamp": format_optional_iso(
            child_text(node, "senior-editor-assigned-date")
        ),
    }


def _potential_person(node: ET.Element, prefix: str) -> dict:
    """ejp_manuscript_xml.py:346-359."""
    return {
        "person_id": child_text(node, prefix + "person-id"),
        "suggested_to_include": parse_yes_no(
            child_text(node, prefix + "suggested-to-include")
        ),
        "suggested_to_exclude": parse_yes_no(
            child_text(node, prefix + "suggested-to-exclude")
        ),
    }


def _author_funding(node: ET.Element) -> dict:
    """ejp_manuscript_xml.py:362-376."""
    return {
        "author_person_id": child_text(node, "author-person-id"),
        "sequence": to_int(child_text(node, "funding-seq")),
        "funding_title": child_text(node, "funding-title"),
        "grant_reference": child_text(node, "grant-reference-number"),
    }


def _subject_area(node: ET.Element) -> dict:
    return {"subject_area_name": child_text(node, "theme")}


def _research_organism(node: ET.Element) -> dict:
    return {"research_organism_name": child_text(node, "subject-area")}


def _keyword(node: ET.Element) -> dict:
    return {"keyword": child_text(node, "word")}


def _email(node: ET.Element) -> dict:
    """ejp_manuscript_xml.py:400-422."""
    return {
        "from_email": child_text(node, "email-from"),
        "to_email": child_text(node, "email-to"),
        "cc_email": child_text(node, "email-cc"),
        "bcc_email": child_text(node, "email-bcc"),
        "email_timestamp": format_optional_iso(child_text(node, "email-date")),
        "email_status": child_text(node, "email-draft"),
        "subject": child_text(node, "email-subject"),
        "from_person_id": child_text(node, "email-sender-person-id"),
        "to_person_id": child_text(node, "email-recipient-person-id"),
        "triggered_by_person_id": child_text(node, "email-triggered-by-person-id"),
    }


def manuscript_dict(
    manuscript_node: ET.Element | None,
    modified_timestamp_str: str,
    source_filename: str,
    manuscript_id: str,
    long_manuscript_identifier: str,
) -> dict:
    """ejp_manuscript_xml.py:189-204."""
    return {
        "provenance": {"source_filename": source_filename},
        "manuscript_id": manuscript_id,
        "long_manuscript_identifier": long_manuscript_identifier,
        "modified_timestamp": modified_timestamp_str,
        "country": (
            child_text(manuscript_node, "country")
            if manuscript_node is not None
            else None
        ),
        "doi": (
            child_text(manuscript_node, "production-data/production-data-doi")
            if manuscript_node is not None
            else None
        ),
    }


def version_dict(
    version_node: ET.Element, modified_timestamp_str: str, source_filename: str
) -> dict:
    """Full version payload (ejp_manuscript_xml.py:434-546), including the
    dual-spelling unions (U1): referees+reviewers, editors+reviewing-editors,
    potential-referees+potential-reviewers."""
    stages = extract_list(version_node, "history/stage", _stage)
    created_timestamp = stages[0]["stage_timestamp"] if stages else None

    manuscript_id, manuscript_number = manuscript_id_and_number(
        version_node, source_filename
    )
    full_type = child_text(version_node, "manuscript-type")
    overall_stage, manuscript_type = split_manuscript_type(full_type or "")
    decision_ts_str = child_text(version_node, "decision-date")
    return {
        "provenance": {"source_filename": source_filename},
        "created_timestamp": created_timestamp,
        "modified_timestamp": modified_timestamp_str,
        "manuscript_id": manuscript_id,
        "long_manuscript_identifier": manuscript_number,
        "full_manuscript_type": full_type,
        "manuscript_type": manuscript_type,
        "version_id": derive_version_id(manuscript_id, created_timestamp),
        "manuscript_title": child_text(version_node, "title"),
        "abstract": child_text(version_node, "abstract"),
        "overall_stage": overall_stage,
        "decision": child_text(version_node, "decision"),
        "decision_timestamp": (
            format_iso(decision_ts_str) if decision_ts_str else None
        ),
        "stages": stages,
        "authors": extract_list(version_node, "authors/author", _author),
        "reviewers": extract_list(
            version_node, "referees/referee",
            lambda n: _reviewer(n, "referee-"),
        )
        + extract_list(
            version_node, "reviewers/reviewer",
            lambda n: _reviewer(n, "reviewer-"),
        ),
        "reviewing_editors": extract_list(
            version_node, "editors/editor",
            lambda n: _reviewing_editor(n, "editor-"),
        )
        + extract_list(
            version_node, "reviewing-editors/reviewing-editor",
            lambda n: _reviewing_editor(n, "reviewing-editor-"),
        ),
        "senior_editors": extract_list(
            version_node, "senior-editors/senior-editor", _senior_editor
        ),
        "potential_reviewers": extract_list(
            version_node, "potential-referees/potential-referee",
            lambda n: _potential_person(n, "potential-referee-"),
        )
        + extract_list(
            version_node, "potential-reviewers/potential-reviewer",
            lambda n: _potential_person(n, "potential-reviewer-"),
        ),
        "potential_reviewing_editors": extract_list(
            version_node,
            "potential-reviewing-editors/potential-reviewing-editor",
            lambda n: _potential_person(n, "potential-reviewing-editor-"),
        ),
        "potential_senior_editors": extract_list(
            version_node,
            "potential-senior-editors/potential-senior-editor",
            lambda n: _potential_person(n, "potential-senior-editor-"),
        ),
        "author_funding": extract_list(
            version_node, "author-funding/author-funding", _author_funding
        ),
        "subject_areas": extract_list(version_node, "themes/theme", _subject_area),
        "research_organisms": extract_list(
            version_node, "subject-areas/subject-area", _research_organism
        ),
        "keywords": extract_list(version_node, "keywords/keywords", _keyword),
        "emails": extract_list(version_node, "emails/email", _email),
    }


# ------------------------------------------------------- document parsing


def parse_persons_document(
    root: ET.Element, modified_timestamp_str: str, source_filename: str
) -> Iterator[dict]:
    """persons XML → person_v2 entity rows (ejp_person_xml.py:258-290)."""
    for idx, node in enumerate(root.findall("person")):
        payload = person_v2_dict(node, idx, modified_timestamp_str, source_filename)
        yield {
            "entity_type": "person_v2",
            "doc_id": payload["person_id"],
            "modified_timestamp": payload["modified_timestamp"],
            "payload": payload,
            "node_index": idx,
        }


def parse_manuscript_document(
    root: ET.Element, modified_timestamp_str: str, source_filename: str
) -> Iterator[dict]:
    """manuscript XML → person + manuscript + manuscript_version rows
    (ejp_manuscript_xml.py:553-602)."""
    idx = 0
    for node in root.findall("people/person"):
        payload = manuscript_person_dict(node, modified_timestamp_str, source_filename)
        yield {
            "entity_type": "person",
            "doc_id": payload["person_id"]
            or generate_person_id(source_filename, idx),
            "modified_timestamp": payload["modified_timestamp"],
            "payload": payload,
            "node_index": idx,
        }
        idx += 1

    version_payloads = [
        version_dict(node, modified_timestamp_str, source_filename)
        for node in root.findall("manuscript/version")
    ]
    if version_payloads:
        manuscript_id = version_payloads[0]["manuscript_id"]
        long_identifier = version_payloads[0]["long_manuscript_identifier"]
    else:
        long_identifier = filename_to_manuscript_number(source_filename)
        manuscript_id = manuscript_number_to_manuscript_id(long_identifier)

    yield {
        "entity_type": "manuscript",
        "doc_id": manuscript_id,
        "modified_timestamp": modified_timestamp_str,
        "payload": manuscript_dict(
            root.find("manuscript"),
            modified_timestamp_str,
            source_filename,
            manuscript_id,
            long_identifier,
        ),
        "node_index": idx,
    }
    idx += 1
    for payload in version_payloads:
        yield {
            "entity_type": "manuscript_version",
            "doc_id": payload["version_id"],
            "modified_timestamp": modified_timestamp_str,
            "payload": payload,
            "node_index": idx,
        }
        idx += 1


# -------------------------------------------------------- recovering parse

_TAG_RE = re.compile(rb"<(/?)([A-Za-z_][\w.\-]*)(?:[^<>\"']|\"[^\"]*\"|'[^']*')*?(/?)>")


def _repair_xml(data: bytes) -> bytes:
    """Best-effort salvage of common breakages (the reference gets this
    from lxml ``recover=True``, ejp_zip.py:41-45; lxml is not in this
    container so the common cases are repaired explicitly):

    * stray ``&`` that is not an entity → ``&amp;``
    * trailing truncated tag (``<foo`` with no ``>``) → dropped
    * unclosed elements (truncated document) → closed in stack order
    """
    fixed = re.sub(
        rb"&(?![A-Za-z][A-Za-z0-9]*;|#[0-9]+;|#x[0-9A-Fa-f]+;)", b"&amp;", data
    )
    last_lt = fixed.rfind(b"<")
    if last_lt > fixed.rfind(b">"):
        fixed = fixed[:last_lt]
    stack: list[bytes] = []
    for m in _TAG_RE.finditer(fixed):
        closing, name, selfclose = m.groups()
        if selfclose:
            continue
        if closing:
            if name in stack:
                while stack and stack[-1] != name:
                    stack.pop()
                if stack:
                    stack.pop()
        else:
            stack.append(name)
    for name in reversed(stack):
        fixed += b"</" + name + b">"
    return fixed


def parse_xml_recovering(data: bytes) -> tuple[ET.Element | None, str | None]:
    """Parse; on failure attempt repair; on hard failure return the error
    WITH the offending source line (parity with
    ``utils/xml_transform_util/xml.py:8-22``)."""
    try:
        return ET.fromstring(data), None
    except ET.ParseError as exc:
        try:
            return ET.fromstring(_repair_xml(data)), None
        except ET.ParseError:
            lineno = exc.position[0] if exc.position else 0
            lines = data.split(b"\n")
            offending = (
                lines[lineno - 1].decode("utf-8", "replace")
                if 0 < lineno <= len(lines)
                else ""
            )
            return None, f"xml parse: failed at line=[{offending}] due to {exc}"
