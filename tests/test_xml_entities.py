"""Golden-dict parity tests for the EJP XML entity extraction, mirroring
the reference's tests/unit_test/formats/ejp_person_xml_test.py and
ejp_manuscript_xml_test.py cases (entity decode, timestamp normalization,
dual-spelling unions, generated ids, NotAcceptable version ids)."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from data_hub_ejp_xml_pipeline_spark.sources.xml_entities import (
    derive_version_id,
    generate_person_id,
    manuscript_person_dict,
    parse_manuscript_document,
    parse_persons_document,
    parse_xml_recovering,
    person_v2_dict,
    split_manuscript_type,
    version_dict,
)

TS_1 = "2018-01-01T03:04:05Z"
TS_2 = "2018-02-02T03:04:05Z"
TS_3 = "2018-02-03T03:04:05Z"
SRC = "batch.zip/file.xml"

PERSON_V2_XML = f"""
<person>
  <person-id>person1</person-id>
  <status>Active</status>
  <profile-modify-date>{TS_1}</profile-modify-date>
  <title>Title1</title>
  <first-name>First1</first-name>
  <middle_nm>Middle1</middle_nm>
  <last-name>Last1</last-name>
  <native_nm>Native1</native_nm>
  <institution>Institution1</institution>
  <email>Email1</email>
  <secondary-email>SecondaryEmail1</secondary-email>
  <memberships>
    <membership active_ind="1" member_id_type_cde="ORCID">
      <member_id>Orcid 1</member_id>
      <start_dt>{TS_1}</start_dt>
      <end_dt>{TS_2}</end_dt>
      <last_update_dt>{TS_3}</last_update_dt>
      <last_update_p_id>person2</last_update_p_id>
    </membership>
  </memberships>
  <roles>
    <role role_nm="Role 1" active_ind="1" start_dt="{TS_1}" end_dt="{TS_2}">
      <update_dt>{TS_3}</update_dt>
      <update_p_id>person2</update_p_id>
    </role>
  </roles>
  <addresses>
    <address active_ind="1" addr_type="Address Type 1">
      <country>Country 1</country><state>Area 1</state><city>City 1</city>
      <zip>Post Code 1</zip><addr1>Address Line 1</addr1>
      <addr2>Address Line 2</addr2><addr3>Address Line 3</addr3>
      <organization>Organization 1</organization>
      <department>Department 1</department><division>Division 1</division>
      <laboratory>Laboratory 1</laboratory><job_title>Job Title 1</job_title>
      <e_mail>Email 1</e_mail><telephone>Telephone 1</telephone>
      <start_dt>{TS_1}</start_dt><end_dt>{TS_2}</end_dt>
    </address>
  </addresses>
  <organizations>
    <organization><org-id>ORG_ID_1</org-id><org-name>ORG_NAME_1</org-name>
      <org-type>ORG_TYPE_1</org-type></organization>
  </organizations>
  <dates-not-available>
    <dna><dna-start-date>{TS_1}</dna-start-date>
      <dna-end-date>{TS_2}</dna-end-date></dna>
  </dates-not-available>
  <keywords><keyword>Keyword 1</keyword><keyword>Keyword 2</keyword></keywords>
  <person-tags><person-tag>Person Tag 1</person-tag>
    <person-tag>Person Tag 2</person-tag></person-tags>
  <merge-info><merged-into-person-id>person1</merged-into-person-id>
    <merged-into-person-id>person2</merged-into-person-id></merge-info>
  <subject-area-list name="Research Organism(s)">
    <subject-area>Research Organism 1</subject-area>
    <subject-area>Research Organism 2</subject-area>
  </subject-area-list>
  <subject-area-list name="Major Subject Area(s)">
    <subject-area>Subject Area 1</subject-area>
    <subject-area>Subject Area 2</subject-area>
  </subject-area-list>
</person>
"""


def _v2(xml: str = PERSON_V2_XML, idx: int = 0, mts: str = TS_2) -> dict:
    return person_v2_dict(ET.fromstring(xml), idx, mts, SRC)


class TestPersonV2:
    def test_basic_fields(self):
        p = _v2()
        assert {
            k: p[k]
            for k in (
                "person_id", "modified_timestamp", "status", "title",
                "first_name", "middle_name", "last_name", "native_name",
                "institution", "email", "secondary_email",
            )
        } == {
            "person_id": "person1",
            "modified_timestamp": TS_1,
            "status": "Active",
            "title": "Title1",
            "first_name": "First1",
            "middle_name": "Middle1",
            "last_name": "Last1",
            "native_name": "Native1",
            "institution": "Institution1",
            "email": "Email1",
            "secondary_email": "SecondaryEmail1",
        }

    def test_generated_person_id_and_node_index_provenance(self):
        xml = PERSON_V2_XML.replace(
            "<person-id>person1</person-id>", "<person-id></person-id>"
        )
        p = _v2(xml, idx=3)
        assert p["person_id"] == generate_person_id(SRC, 3) == f"generated-{SRC}-3"
        assert p["provenance"] == {"source_filename": SRC, "node_index": 3}

    def test_memberships(self):
        assert _v2()["external_references"] == [{
            "is_enabled": True,
            "reference_type": "ORCID",
            "reference_value": "Orcid 1",
            "start_timestamp": TS_1,
            "end_timestamp": TS_2,
            "modified_timestamp": TS_3,
            "modified_by_person_id": "person2",
        }]

    def test_roles(self):
        assert _v2()["roles"] == [{
            "role_name": "Role 1",
            "is_enabled": True,
            "start_timestamp": TS_1,
            "end_timestamp": TS_2,
            "modified_timestamp": TS_3,
            "modified_by_person_id": "person2",
        }]

    def test_roles_blank_timestamps_are_none(self):
        xml = (
            PERSON_V2_XML.replace(f'start_dt="{TS_1}" end_dt="{TS_2}"',
                                  'start_dt="" end_dt=""')
            .replace(f"<update_dt>{TS_3}</update_dt>", "<update_dt></update_dt>")
        )
        role = _v2(xml)["roles"][0]
        assert role["start_timestamp"] is None
        assert role["end_timestamp"] is None
        assert role["modified_timestamp"] is None

    def test_seventeen_field_address(self):
        assert _v2()["addresses"] == [{
            "is_enabled": True,
            "address_type": "Address Type 1",
            "country": "Country 1",
            "area": "Area 1",
            "city": "City 1",
            "postal_code": "Post Code 1",
            "organization": "Organization 1",
            "department": "Department 1",
            "division": "Division 1",
            "laboratory": "Laboratory 1",
            "job_title": "Job Title 1",
            "email": "Email 1",
            "telephone": "Telephone 1",
            "address_line_1": "Address Line 1",
            "address_line_2": "Address Line 2",
            "address_line_3": "Address Line 3",
            "start_timestamp": TS_1,
            "end_timestamp": TS_2,
        }]

    def test_organizations_and_dates_not_available(self):
        p = _v2()
        assert p["organizations"] == [{
            "organization_id": "ORG_ID_1",
            "organization_name": "ORG_NAME_1",
            "organization_type": "ORG_TYPE_1",
        }]
        assert p["dates_not_available"] == [
            {"start_timestamp": TS_1, "end_timestamp": TS_2}
        ]

    def test_keywords_tags_merged_ids(self):
        p = _v2()
        assert p["keywords"] == ["Keyword 1", "Keyword 2"]
        assert p["person_tags"] == ["Person Tag 1", "Person Tag 2"]
        assert p["merged_into_person_ids"] == ["person1", "person2"]

    def test_attribute_filtered_subject_area_lists(self):
        p = _v2()
        assert p["research_organisms"] == [
            "Research Organism 1", "Research Organism 2"
        ]
        assert p["subject_areas"] == ["Subject Area 1", "Subject Area 2"]

    def test_html_entity_decode(self):
        xml = PERSON_V2_XML.replace(
            "<last-name>Last1</last-name>", "<last-name>&apos;</last-name>"
        )
        assert _v2(xml)["last_name"] == "'"

    def test_fallback_to_document_timestamp(self):
        xml = PERSON_V2_XML.replace(
            f"<profile-modify-date>{TS_1}</profile-modify-date>",
            "<profile-modify-date></profile-modify-date>",
        )
        assert _v2(xml, mts=TS_2)["modified_timestamp"] == TS_2

    def test_naive_wall_time_is_us_eastern(self):
        # 2020-01-02 is EST (UTC-5); 2020-07-02 is EDT (UTC-4)
        xml = PERSON_V2_XML.replace(TS_1, "2020-01-02 03:04:05")
        assert _v2(xml)["modified_timestamp"] == "2020-01-02T08:04:05Z"
        xml = PERSON_V2_XML.replace(TS_1, "2020-07-02 03:04:05")
        assert _v2(xml)["modified_timestamp"] == "2020-07-02T07:04:05Z"


MANUSCRIPT_PERSON_XML = f"""
<person>
  <person-id>a1</person-id>
  <profile-modify-date>{TS_1}</profile-modify-date>
  <title>T</title><first-name>Alan</first-name><middle-name>M</middle-name>
  <last-name>Turing</last-name><institution>Inst</institution>
  <email>a@b</email><secondary_email>a2@b</secondary_email>
  <memberships><membership><member-type>ORCID</member-type>
    <member-id>0000-0002</member-id></membership></memberships>
  <roles><role><role-type>Author</role-type></role></roles>
  <addresses><address>
    <address-type>Work</address-type><address-country>UK</address-country>
    <address-state-province>Cambs</address-state-province>
    <address-city>Cambridge</address-city>
    <address-zip-postal-code>CB1</address-zip-postal-code>
    <address-department>Maths</address-department>
    <address-street-address-1>1 Road</address-street-address-1>
    <address-street-address-2>Flat 2</address-street-address-2>
    <address-start-date>{TS_1}</address-start-date>
    <address-end-date>{TS_2}</address-end-date>
  </address></addresses>
</person>
"""


class TestManuscriptPerson:
    def test_fields(self):
        p = manuscript_person_dict(ET.fromstring(MANUSCRIPT_PERSON_XML), TS_2, SRC)
        assert p["person_id"] == "a1"
        assert p["middle_name"] == "M"
        assert p["secondary_email"] == "a2@b"
        assert p["external_references"] == [
            {"reference_type": "ORCID", "reference_value": "0000-0002"}
        ]
        assert p["roles"] == [{"role_name": "Author"}]
        assert p["addresses"] == [{
            "address_type": "Work",
            "country": "UK",
            "area": "Cambs",
            "city": "Cambridge",
            "postal_code": "CB1",
            "department": "Maths",
            "address_line_1": "1 Road",
            "address_line_2": "Flat 2",
            "start_timestamp": TS_1,
            "end_timestamp": TS_2,
        }]


VERSION_XML = f"""
<version>
  <manuscript-number>05-02-2020-RA-eLife-12345</manuscript-number>
  <manuscript-type>Initial Submission: Research Article</manuscript-type>
  <title>Title &amp; More</title>
  <abstract>Abs</abstract>
  <decision>Accept Full Submission</decision>
  <decision-date>{TS_2}</decision-date>
  <history>
    <stage><stage-name>Submission</stage-name><start-date>{TS_1}</start-date>
      <stage-affective-person-id>a1</stage-affective-person-id></stage>
    <stage><stage-name>Review</stage-name><start-date>{TS_2}</start-date></stage>
  </history>
  <authors><author><author-person-id>a1</author-person-id>
    <author-seq>1</author-seq><is-corr>true</is-corr></author></authors>
  <referees><referee><referee-person-id>r1</referee-person-id>
    <referee-sequence>1</referee-sequence>
    <referee-started-date>{TS_1}</referee-started-date>
    <referee-due-date>{TS_2}</referee-due-date>
    <referee-next-chase-date>{TS_3}</referee-next-chase-date>
    <referee-received-date>{TS_3}</referee-received-date></referee></referees>
  <reviewers><reviewer><reviewer-person-id>r2</reviewer-person-id>
    <reviewer-sequence>2</reviewer-sequence></reviewer></reviewers>
  <editors><editor><editor-person-id>e1</editor-person-id>
    <editor-assigned-date>{TS_1}</editor-assigned-date>
    <editor-decision-due-date>{TS_2}</editor-decision-due-date></editor></editors>
  <reviewing-editors><reviewing-editor>
    <reviewing-editor-person-id>e2</reviewing-editor-person-id>
  </reviewing-editor></reviewing-editors>
  <senior-editors><senior-editor>
    <senior-editor-person-id>s1</senior-editor-person-id>
    <senior-editor-assigned-date>{TS_1}</senior-editor-assigned-date>
  </senior-editor></senior-editors>
  <potential-referees><potential-referee>
    <potential-referee-person-id>pr1</potential-referee-person-id>
    <potential-referee-suggested-to-include>yes</potential-referee-suggested-to-include>
  </potential-referee></potential-referees>
  <potential-reviewers><potential-reviewer>
    <potential-reviewer-person-id>pr2</potential-reviewer-person-id>
    <potential-reviewer-suggested-to-exclude>No</potential-reviewer-suggested-to-exclude>
  </potential-reviewer></potential-reviewers>
  <potential-reviewing-editors><potential-reviewing-editor>
    <potential-reviewing-editor-person-id>pe1</potential-reviewing-editor-person-id>
  </potential-reviewing-editor></potential-reviewing-editors>
  <potential-senior-editors><potential-senior-editor>
    <potential-senior-editor-person-id>ps1</potential-senior-editor-person-id>
  </potential-senior-editor></potential-senior-editors>
  <author-funding><author-funding>
    <author-person-id>a1</author-person-id><funding-seq>1</funding-seq>
    <funding-title>Grant</funding-title>
    <grant-reference-number>G-1</grant-reference-number>
  </author-funding></author-funding>
  <themes><theme><theme>Neuroscience</theme></theme></themes>
  <subject-areas><subject-area><subject-area>Mouse</subject-area></subject-area></subject-areas>
  <keywords><keywords><word>spark</word></keywords></keywords>
  <emails><email>
    <email-from>x@y</email-from><email-to>z@y</email-to>
    <email-cc>c@y</email-cc><email-bcc>b@y</email-bcc>
    <email-date>{TS_1}</email-date><email-draft>Sent</email-draft>
    <email-subject>Hi</email-subject>
    <email-sender-person-id>a1</email-sender-person-id>
    <email-recipient-person-id>r1</email-recipient-person-id>
    <email-triggered-by-person-id>e1</email-triggered-by-person-id>
  </email></emails>
</version>
"""


def _ver(xml: str = VERSION_XML) -> dict:
    return version_dict(ET.fromstring(xml), TS_3, SRC)


class TestVersion:
    def test_ids_and_type_split(self):
        v = _ver()
        assert v["manuscript_id"] == "12345"
        assert v["long_manuscript_identifier"] == "05-02-2020-RA-eLife-12345"
        assert v["full_manuscript_type"] == "Initial Submission: Research Article"
        assert v["manuscript_type"] == "Research Article"
        assert v["overall_stage"] == "Initial Submission"
        assert v["version_id"] == f"12345/{TS_1}"
        assert v["created_timestamp"] == TS_1
        assert v["modified_timestamp"] == TS_3
        assert v["manuscript_title"] == "Title & More"
        assert v["decision"] == "Accept Full Submission"
        assert v["decision_timestamp"] == TS_2

    def test_full_submission_type_untouched(self):
        assert split_manuscript_type("Research Article") == (
            "Full Submission", "Research Article"
        )

    def test_stages_with_person_id(self):
        assert _ver()["stages"] == [
            {"stage_timestamp": TS_1, "stage_name": "Submission", "person_id": "a1"},
            {"stage_timestamp": TS_2, "stage_name": "Review", "person_id": None},
        ]

    def test_authors(self):
        assert _ver()["authors"] == [
            {"person_id": "a1", "sequence": 1, "is_corresponding_author": True}
        ]

    def test_reviewers_dual_spelling_union(self):
        v = _ver()
        assert [r["person_id"] for r in v["reviewers"]] == ["r1", "r2"]
        assert v["reviewers"][0] == {
            "person_id": "r1",
            "sequence": 1,
            "started_timestamp": TS_1,
            "due_timestamp": TS_2,
            "next_chase_timestamp": TS_3,
            "received_timestamp": TS_3,
        }
        assert v["reviewers"][1]["sequence"] == 2
        assert v["reviewers"][1]["started_timestamp"] is None

    def test_editors_dual_spelling_union(self):
        v = _ver()
        assert v["reviewing_editors"] == [
            {"person_id": "e1", "assigned_timestamp": TS_1, "due_timestamp": TS_2},
            {"person_id": "e2", "assigned_timestamp": None, "due_timestamp": None},
        ]
        assert v["senior_editors"] == [
            {"person_id": "s1", "assigned_timestamp": TS_1}
        ]

    def test_potential_people(self):
        v = _ver()
        assert v["potential_reviewers"] == [
            {"person_id": "pr1", "suggested_to_include": True,
             "suggested_to_exclude": None},
            {"person_id": "pr2", "suggested_to_include": None,
             "suggested_to_exclude": False},
        ]
        assert v["potential_reviewing_editors"][0]["person_id"] == "pe1"
        assert v["potential_senior_editors"][0]["person_id"] == "ps1"

    def test_author_funding_subjects_keywords_emails(self):
        v = _ver()
        assert v["author_funding"] == [{
            "author_person_id": "a1", "sequence": 1,
            "funding_title": "Grant", "grant_reference": "G-1",
        }]
        assert v["subject_areas"] == [{"subject_area_name": "Neuroscience"}]
        assert v["research_organisms"] == [{"research_organism_name": "Mouse"}]
        assert v["keywords"] == [{"keyword": "spark"}]
        assert v["emails"] == [{
            "from_email": "x@y", "to_email": "z@y", "cc_email": "c@y",
            "bcc_email": "b@y", "email_timestamp": TS_1,
            "email_status": "Sent", "subject": "Hi",
            "from_person_id": "a1", "to_person_id": "r1",
            "triggered_by_person_id": "e1",
        }]

    def test_not_acceptable_version_id_without_stages(self):
        xml = VERSION_XML.replace("<history>", "<history-x>").replace(
            "</history>", "</history-x>"
        )
        v = _ver(xml)
        assert v["created_timestamp"] is None
        assert v["version_id"] == "NotAcceptable 12345/None"
        assert derive_version_id("99999", None) == "NotAcceptable 99999/None"

    def test_manuscript_number_fallback_to_filename_stem(self):
        xml = VERSION_XML.replace(
            "<manuscript-number>05-02-2020-RA-eLife-12345</manuscript-number>",
            "<manuscript-number></manuscript-number>",
        )
        v = version_dict(ET.fromstring(xml), TS_3, "batch.zip/ms-stem.xml")
        assert v["long_manuscript_identifier"] == "ms-stem"
        assert v["manuscript_id"] == "ms-stem"

    def test_unrecognised_number_falls_back_to_full_number(self):
        xml = VERSION_XML.replace("05-02-2020-RA-eLife-12345", "OTHER-123")
        v = _ver(xml)
        assert v["manuscript_id"] == "OTHER-123"


class TestDocumentParsing:
    def test_persons_document_yields_person_v2(self):
        root = ET.fromstring(f"<persons>{PERSON_V2_XML}{PERSON_V2_XML}</persons>")
        rows = list(parse_persons_document(root, TS_2, SRC))
        assert [r["entity_type"] for r in rows] == ["person_v2", "person_v2"]
        assert [r["payload"]["provenance"]["node_index"] for r in rows] == [0, 1]

    def test_manuscript_document_order_and_ids(self):
        root = ET.fromstring(
            "<xml><people>" + MANUSCRIPT_PERSON_XML + "</people>"
            "<manuscript><country>UK</country>"
            "<production-data><production-data-doi>10.7554/x</production-data-doi>"
            "</production-data>" + VERSION_XML + "</manuscript></xml>"
        )
        rows = list(parse_manuscript_document(root, TS_3, SRC))
        assert [r["entity_type"] for r in rows] == [
            "person", "manuscript", "manuscript_version"
        ]
        ms = rows[1]
        assert ms["doc_id"] == "12345"
        assert ms["payload"]["country"] == "UK"
        assert ms["payload"]["doi"] == "10.7554/x"
        assert ms["payload"]["long_manuscript_identifier"] == (
            "05-02-2020-RA-eLife-12345"
        )
        assert rows[2]["doc_id"] == f"12345/{TS_1}"

    def test_manuscript_document_without_versions_uses_filename(self):
        root = ET.fromstring("<xml><manuscript><country>UK</country></manuscript></xml>")
        rows = list(parse_manuscript_document(root, TS_3, "b.zip/05-02-2020-RA-eLife-99999.xml"))
        assert rows[0]["entity_type"] == "manuscript"
        assert rows[0]["doc_id"] == "99999"


class TestRecoveringParse:
    def test_wellformed_passthrough(self):
        root, err = parse_xml_recovering(b"<a><b>x</b></a>")
        assert err is None and root.tag == "a"

    def test_truncated_document_recovers(self):
        root, err = parse_xml_recovering(
            b"<persons><person><person-id>p1</person-id><first-name>A</first-name>"
        )
        assert err is None
        assert root.find("person/person-id").text == "p1"

    def test_trailing_partial_tag_recovers(self):
        root, err = parse_xml_recovering(b"<a><b>x</b><c")
        assert err is None
        assert root.find("b").text == "x"

    def test_stray_ampersand_recovers(self):
        root, err = parse_xml_recovering(b"<a><b>Tom & Jerry</b></a>")
        assert err is None
        assert root.find("b").text == "Tom & Jerry"

    def test_hard_broken_reports_offending_line(self):
        data = b"<a>\n<b>ok</b>\n<<<%%% not xml\n</a>"
        root, err = parse_xml_recovering(data)
        assert root is None
        assert "line=[" in err and "not xml" in err
