// Live interop harness: executes the UNMODIFIED reference implementation
// (/root/reference/src/{util,hll}.js, Apache-2.0) inside a vm context and
// exercises it against hex sketches produced by js_hll_spark.
//
// stdin:  JSON {cases: [{name, hex, registers?: [int], values?: [[lo,hi]]}]}
// stdout: JSON [{name, algorithm, cardinality, algorithmCardinality,
//                reg_match (vs input registers, if given),
//                direct_match (decode == addRaw of input values, if given),
//                rehex}]
"use strict";
const fs = require("fs");
const vm = require("vm");

const REF = process.env.JS_HLL_REFERENCE || "/root/reference/src";
const ctx = vm.createContext({ console });
for (const f of ["util.js", "hll.js"]) {
  vm.runInContext(fs.readFileSync(`${REF}/${f}`, "utf8"), ctx, { filename: f });
}
const hll = ctx.hll;

const input = JSON.parse(fs.readFileSync(0, "utf8"));

// cumulative mode: start from hex0, addRaw each [lo,hi] value, report the
// reference's float cardinality after every insert (NaN as the string
// "NaN" — JSON has no NaN literal). Mirrors test/hll-test.js:444-481.
if (input.cumulative) {
  const set = hll.fromHexString(input.cumulative.hex0).hllSet;
  const cards = [];
  for (const v of input.cumulative.values) {
    set.addRaw([v[0] >>> 0, v[1] >>> 0]);
    const c = set.algorithmCardinality();
    cards.push(Number.isNaN(c) || c < 0 ? "NaN" : c);
  }
  process.stdout.write(JSON.stringify({ cards }));
  process.exit(0);
}

const out = [];
for (const c of input.cases) {
  const parsed = hll.fromHexString(c.hex);
  const set = parsed.hllSet;
  const res = {
    name: c.name,
    algorithm: parsed.algorithm,
    cardinality: set.cardinality(),
    algorithmCardinality: set.algorithmCardinality(),
    rehex: set.toHexString(),
  };
  if (c.registers) {
    res.reg_match =
      set.registers.length === c.registers.length &&
      set.registers.every((v, i) => v === c.registers[i]);
    if (!res.reg_match) {
      res.first_diff = set.registers.findIndex((v, i) => v !== c.registers[i]);
    }
  }
  if (c.values) {
    // decode path must equal the reference's own addRaw path
    const direct = new hll.HLL(set.log2m, set.registerWidth);
    for (const v of c.values) direct.addRaw([v[0] >>> 0, v[1] >>> 0]);
    res.direct_match = set.registers.every((v, i) => v === direct.registers[i]);
  }
  out.push(res);
}
process.stdout.write(JSON.stringify(out));
