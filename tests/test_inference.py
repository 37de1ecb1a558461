"""RDFS inference store — port of the reference test corpus
(/root/reference/inference/inference_test.go, all 40 cases), plus the
distributed from_graph construction and closure-view exports."""

import pytest

from cayley_spark.inference import CLASS, PROPERTY, RESOURCE, Store
from cayley_spark.values import BNode, IRI, String

domain = IRI("http://www.w3.org/2000/01/rdf-schema#domain")
prange = IRI("http://www.w3.org/2000/01/rdf-schema#range")
ptype = IRI("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
subClassOf = IRI("http://www.w3.org/2000/01/rdf-schema#subClassOf")
subPropertyOf = IRI("http://www.w3.org/2000/01/rdf-schema#subPropertyOf")
literal = IRI("http://www.w3.org/2000/01/rdf-schema#Literal")

alice, bob = IRI("alice"), IRI("bob")
engineer, person = IRI("Engineer"), IRI("Person")
software_engineer = IRI("SoftwareEngineer")
information, likes = IRI("information"), IRI("likes")
name, personal = IRI("name"), IRI("personal")

alice_is_person = (alice, ptype, person)
alice_likes_bob = (alice, likes, bob)
likes_range_person = (likes, prange, person)
engineer_class = (engineer, ptype, CLASS)
engineer_sub = (engineer, subClassOf, person)
name_domain_person = (name, domain, person)
name_property = (name, ptype, PROPERTY)
name_sub_personal = (name, subPropertyOf, personal)
personal_property = (personal, ptype, PROPERTY)
personal_sub_information = (personal, subPropertyOf, information)
person_class = (person, ptype, CLASS)
software_engineer_class = (software_engineer, ptype, CLASS)
alice_name_alice = (alice, name, String("Alice"))


def test_referenced_type():
    st = Store()
    st.process_quads(alice_is_person)
    assert st.get_class(person) is not None


def test_referenced_bnode_type():
    st = Store()
    st.process_quads((alice, ptype, BNode("123")))
    assert st.get_class(BNode("123")) is not None


def test_referenced_property():
    st = Store()
    st.process_quads(alice_likes_bob)
    assert st.get_property(likes) is not None


def test_new_class_and_bnode_class():
    st = Store()
    st.process_quads(person_class)
    assert st.get_class(person) is not None
    st2 = Store()
    st2.process_quads((BNode("123"), ptype, CLASS))
    assert st2.get_class(BNode("123")) is not None


def test_invalid_class_and_property():
    st = Store()
    st.process_quads((alice, ptype, String("Foo")))
    assert st.get_class(String("Foo")) is None
    st.process_quads((alice, String("Foo"), bob))
    assert st.get_property(String("Foo")) is None


def test_new_property():
    st = Store()
    st.process_quads(name_property)
    assert st.get_property(name) is not None


def test_sub_class_links():
    st = Store()
    st.process_quads(engineer_sub)
    c, sup = st.get_class(engineer), st.get_class(person)
    assert c is not None and sup is not None
    assert sup in c.super and c in sup.sub


def test_sub_property_links():
    st = Store()
    st.process_quads(name_sub_personal)
    p, sup = st.get_property(name), st.get_property(personal)
    assert p is not None and sup is not None
    assert sup in p.super and p in sup.sub


def test_property_domain_range():
    st = Store()
    st.process_quads(name_domain_person)
    p, c = st.get_property(name), st.get_class(person)
    assert p.domain is c and p in c.own_prop
    st2 = Store()
    st2.process_quads(likes_range_person)
    p2, c2 = st2.get_property(likes), st2.get_class(person)
    assert p2.range is c2 and p2 in c2.in_prop


def test_is_sub_class_of():
    st = Store()
    st.process_quads(engineer_sub)
    assert st.get_class(engineer).is_sub_class_of(st.get_class(person))


def test_is_sub_class_of_recursive_itself_resource():
    st = Store()
    st.process_quads(engineer_sub, (software_engineer, subClassOf, engineer))
    assert st.get_class(software_engineer).is_sub_class_of(st.get_class(person))
    st2 = Store()
    st2.process_quads(person_class)
    assert st2.get_class(person).is_sub_class_of(st2.get_class(person))
    assert st2.get_class(person).is_sub_class_of(st2.get_class(RESOURCE))


def test_is_sub_property_of():
    st = Store()
    st.process_quads(name_sub_personal)
    assert st.get_property(name).is_sub_property_of(st.get_property(personal))
    st.process_quads(personal_sub_information)
    assert st.get_property(name).is_sub_property_of(st.get_property(information))
    st2 = Store()
    st2.process_quads(name_property)
    assert st2.get_property(name).is_sub_property_of(st2.get_property(name))


def test_unprocess_invalid():
    st = Store()
    st.unprocess_quads((alice, String("Foo"), person))
    st.unprocess_quads((alice, ptype, String("Foo")))


def test_delete_referenced_type():
    st = Store()
    st.process_quads(alice_is_person)
    st.unprocess_quads(alice_is_person)
    assert st.get_class(person) is None


def test_delete_class_with_sub_and_super():
    st = Store()
    st.process_quads(engineer_class, engineer_sub, person_class)
    st.unprocess_quads(person_class)
    assert len(st.get_class(engineer).super) == 0
    st2 = Store()
    st2.process_quads(person_class, engineer_sub, engineer_class)
    st2.unprocess_quads(engineer_class)
    assert len(st2.get_class(person).sub) == 0


def test_delete_new_class_property():
    st = Store()
    st.process_quads(person_class)
    st.unprocess_quads(person_class)
    assert st.get_class(person) is None
    st2 = Store()
    st2.process_quads(name_property)
    st2.unprocess_quads(name_property)
    assert st2.get_property(name) is None


def test_delete_property_with_sub_and_super():
    st = Store()
    st.process_quads(name_property, name_sub_personal, personal_property)
    st.unprocess_quads(personal_property)
    assert len(st.get_property(name).super) == 0
    st2 = Store()
    st2.process_quads(personal_property, name_sub_personal, name_property)
    st2.unprocess_quads(name_property)
    assert len(st2.get_property(personal).sub) == 0


def test_delete_sub_class_and_property_rel():
    st = Store()
    st.process_quads(engineer_class, person_class, engineer_sub)
    st.unprocess_quads(engineer_sub)
    c, sup = st.get_class(engineer), st.get_class(person)
    assert sup not in c.super and c not in sup.sub
    assert not c.is_sub_class_of(sup)
    st2 = Store()
    st2.process_quads(name_property, personal_property, name_sub_personal)
    st2.unprocess_quads(name_sub_personal)
    p, sup2 = st2.get_property(name), st2.get_property(personal)
    assert sup2 not in p.super and p not in sup2.sub
    assert not p.is_sub_property_of(sup2)


def test_delete_domain_range():
    st = Store()
    st.process_quads(name_property, person_class, name_domain_person)
    st.unprocess_quads(name_domain_person)
    assert st.get_property(name).domain is None
    assert st.get_property(name) not in st.get_class(person).own_prop
    st2 = Store()
    st2.process_quads(name_property, (literal, ptype, CLASS), (name, prange, literal))
    st2.unprocess_quads((name, prange, literal))
    assert st2.get_property(name).range is None
    assert st2.get_property(name) not in st2.get_class(literal).in_prop


def test_delete_is_sub_class_of_recursive():
    st = Store()
    st.process_quads(engineer_class, person_class, software_engineer_class)
    quads = [engineer_sub, (software_engineer, subClassOf, engineer)]
    st.process_quads(*quads)
    st.unprocess_quads(*quads)
    assert not st.get_class(software_engineer).is_sub_class_of(
        st.get_class(person)
    )


def test_delete_is_sub_property_of_recursive():
    st = Store()
    st.process_quads(
        name_property, personal_property, (information, ptype, PROPERTY)
    )
    quads = [name_sub_personal, personal_sub_information]
    st.process_quads(*quads)
    st.unprocess_quads(*quads)
    assert not st.get_property(name).is_sub_property_of(
        st.get_property(information)
    )


def test_reference_gc():
    st = Store()
    st.process_quads(alice_is_person)
    assert st.get_class(person)._is_referenced()
    st.unprocess_quads(alice_is_person)
    assert st.get_class(person) is None
    st2 = Store()
    st2.process_quads(alice_likes_bob)
    assert st2.get_property(likes)._is_referenced()
    st2.unprocess_quads(alice_likes_bob)
    assert st2.get_property(likes) is None


def test_domain_range_class_instance_refcounts():
    st = Store()
    st.process_quads(name_domain_person, alice_name_alice)
    c = st.get_class(person)
    assert c is not None and c._is_referenced() and c.references == 1
    st.unprocess_quads(alice_name_alice)
    assert c._is_referenced() and c.references == 0
    st.unprocess_quads(name_domain_person)
    assert not c._is_referenced() and c.references == 0
    st2 = Store()
    st2.process_quads(likes_range_person, alice_likes_bob)
    c2 = st2.get_class(person)
    assert c2.references == 1
    st2.unprocess_quads(alice_likes_bob)
    assert c2.references == 0 and c2._is_referenced()
    st2.unprocess_quads(likes_range_person)
    assert not c2._is_referenced()


def test_delete_non_existing():
    st = Store()
    st.unprocess_quads(person_class)
    st.unprocess_quads(personal_property)
    st.unprocess_quads(alice_is_person)
    st.unprocess_quads(alice_name_alice)


def test_from_graph_and_closures(spark):
    from cayley_spark import GraphStore

    gs = GraphStore.from_quad_values(
        spark,
        [
            person_class,
            engineer_sub,
            (software_engineer, subClassOf, engineer),
            name_domain_person,
            alice_name_alice,
            (bob, name, String("Bob")),
            alice_likes_bob,
        ],
    )
    st = Store.from_graph(gs)
    assert st.get_class(software_engineer).is_sub_class_of(st.get_class(person))
    # distributed refcounts: 2 name quads -> person.references == 2
    assert st.get_property(name).references == 2
    assert st.get_class(person).references == 2
    assert st.get_property(likes).references == 1
    closure = {
        (r["sub"], r["super"])
        for r in st.subclass_closure_df(spark).collect()
    }
    assert ("<SoftwareEngineer>", "<Person>") in closure
    assert ("<Engineer>", "<Person>") in closure
