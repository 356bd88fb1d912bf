package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Golden-shape tests for the TypeScript/JavaScript extractor — same
  * harness shape as the other four parser specs.
  */
class TsParserSpec extends AnyFunSuite {

  private def parse(src: String) = TsParser.parse("src/x.ts", src)

  test("functions, classes, methods, constructor: lexical containers") {
    val src =
      """export function top(a: number): number {
        |  return helper(a)
        |}
        |
        |export class Store {
        |  constructor(addr: string) {
        |    this.addr = check(addr)
        |  }
        |  get(key: string) {
        |    return this.map.lookup(key)
        |  }
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name, u.parentContainer)) == Seq(
      ("function", "top", ""), ("type", "Store", ""),
      ("function", "constructor", "Store"), ("function", "get", "Store")))
    assert(us(0).edges.contains(ParsedEdge("calls", "helper")))
    assert(us(2).unitId == "src/x.ts:Store:constructor")
    assert(us(2).edges.contains(ParsedEdge("method_of", "Store")))
    assert(us(2).edges.contains(ParsedEdge("calls", "check")))
    assert(us(3).edges.contains(ParsedEdge("calls_method", "lookup")))
    assert(us(0).lineStart == 1 && us(0).lineEnd == 3)
  }

  test("arrow bindings are functions; expression bodies carry calls") {
    val src =
      """const shorten = (s: string) => s.slice(0, 8)
        |export const load = async (p: string) => {
        |  return fetchAll(p)
        |}
        |const LIMIT = 10
        |let cache = null
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name)) == Seq(
      ("function", "shorten"), ("function", "load"),
      ("const", "LIMIT"), ("var", "cache")))
    assert(us(0).edges.contains(ParsedEdge("calls_method", "slice")))
    assert(us(1).edges.contains(ParsedEdge("calls", "fetchAll")))
  }

  test("imports: default, namespace, named, bare, require") {
    val src =
      """import React from 'react'
        |import * as fs from 'node:fs'
        |import { a, b } from './util/helpers'
        |import './styles.css'
        |const lodash = require('lodash')
        |""".stripMargin
    val us = parse(src)
    assert(us.map(_.unitType).forall(_ == "import"))
    assert(us.map(_.name) == Seq("React", "fs", "helpers", "lodash"))
    assert(us(0).edges == Seq(ParsedEdge("imports", "react")))
    assert(us(2).edges == Seq(ParsedEdge("imports", "helpers")))
    // './styles.css' drops: 'styles.css' -> tail 'styles.css' keeps the
    // dot after extension strip fails (.css not a code extension), so
    // the identifier gate rejects it — asset imports are not code deps
    assert(!us.exists(_.name.contains("styles")))
  }

  test("jest tests: title from the literal, callback is the call scope") {
    val src =
      """import { run } from './runner'
        |
        |test('runs the pipeline', () => {
        |  const out = run(3)
        |  expect(out).toBe(9)
        |})
        |
        |it('handles empty input', () => run(0))
        |""".stripMargin
    val us = parse(src)
    val tests = us.filter(_.unitType == "test")
    assert(tests.map(_.name) ==
      Seq("runs the pipeline", "handles empty input"))
    assert(tests(0).unitId == "src/x.ts:test:3")
    assert(tests(0).edges.contains(ParsedEdge("calls", "run")))
    assert(tests(0).edges.contains(ParsedEdge("calls", "expect")))
    assert(tests(0).edges.contains(ParsedEdge("calls_method", "toBe")))
    assert(tests(1).edges.contains(ParsedEdge("calls", "run")))
  }

  test("TS type declarations: interface, enum, type alias") {
    val src =
      """export interface Shape {
        |  area(): number
        |}
        |enum Color { Red, Green }
        |type Pair = [number, number]
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name)) == Seq(
      ("type", "Shape"), ("type", "Color"), ("type", "Pair")))
    // interface method signatures are not units (no bodies)
    assert(!us.exists(_.name == "area"))
  }

  test("cleaning: comments, strings, multi-line template literals") {
    val src =
      """// function ghost1() {}
        |/* function ghost2() {} */
        |const s = "function ghost3() {}"
        |const t = `multi
        |function ghost4() {}
        |${callsInside(1)}
        |line`
        |function real() {
        |  return 1
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.count(_.unitType == "function") == 1)
    assert(us.exists(u => u.unitType == "function" && u.name == "real"))
    // the top-level interpolation call has no enclosing function to
    // attach to; see the next test for in-function interpolation calls
    assert(!us.flatMap(_.edges).exists(_.targetName == "callsInside"))
  }

  test("cleaning: interpolation code is visible to the call scan") {
    val src =
      """export function greet(name: string): string {
        |  return `hello ${fmt(name)} and ${outer(`${inner(name)}`)}!`
        |}
        |""".stripMargin
    val us = parse(src)
    val greet = us.find(_.name == "greet").get
    // calls inside ${} reach the scan, including a nested template's
    assert(greet.edges.contains(ParsedEdge("calls", "fmt")))
    assert(greet.edges.contains(ParsedEdge("calls", "outer")))
    assert(greet.edges.contains(ParsedEdge("calls", "inner")))
    // the literal text between interpolations stays blanked
    assert(!greet.edges.exists(_.targetName == "hello"))
  }

  test("cleaning: regex literals lex as literals, division still divides") {
    val src =
      """export function strip(s: string): string {
        |  return s.replace(/['"]+/g, clip(s))
        |}
        |export function half(n: number): number {
        |  return n / two(n)
        |}
        |export function last(s: string): string {
        |  return /[/]end$/.exec(s) ? tail(s) : s
        |}
        |""".stripMargin
    val us = parse(src)
    // a regex containing quotes must not open a string state and blank
    // the rest of its line (the pre-r9 over-blanking loss)
    assert(us.find(_.name == "strip").get.edges
      .contains(ParsedEdge("calls", "clip")))
    // after a value, / is division — the call after it survives
    assert(us.find(_.name == "half").get.edges
      .contains(ParsedEdge("calls", "two")))
    // char-class / does not terminate; method call on the literal and
    // the ternary branches still scan
    val last = us.find(_.name == "last").get
    assert(last.edges.contains(ParsedEdge("calls_method", "exec")))
    assert(last.edges.contains(ParsedEdge("calls", "tail")))
  }

  test("cleaning: keyword checks see the LAST identifier, not a concatenation") {
    val src =
      """export function pick(k: string, o: object): boolean {
        |  return k in /['"]/.source ? yes(k) : no(k)
        |}
        |export function ratio(a: Box): number {
        |  return a.in / scale(a)
        |}
        |""".stripMargin
    val us = parse(src)
    // `k in /re/`: the word buffer must hold "in" (not "kin"), so the
    // slash opens a regex — the ternary's calls survive the blanking
    val pick = us.find(_.name == "pick").get
    assert(pick.edges.contains(ParsedEdge("calls", "yes")))
    assert(pick.edges.contains(ParsedEdge("calls", "no")))
    // `a.in / scale(a)`: after a property ACCESS named like a keyword
    // the slash is division, so the call after it survives
    assert(us.find(_.name == "ratio").get.edges
      .contains(ParsedEdge("calls", "scale")))
  }

  test("DispatchParser routes .ts/.js to TsParser") {
    for (ext <- Seq("ts", "tsx", "js", "jsx", "mjs")) {
      val us = DispatchParser.parse(s"a/b.$ext",
        "export function f() {\n  g()\n}\n")
      assert(us.map(_.unitType) == Seq("function"), ext)
    }
  }
}
