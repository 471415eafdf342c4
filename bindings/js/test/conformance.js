/* Shared conformance checks for the pure-JS LERC decoder: one
 * implementation driven by BOTH the browser harness (harness.html) and
 * the node CI runner (run_node.mjs), so the two can't drift.
 *
 * runConformance(Lerc, vectors, fromB64) -> [{name, ok, error?}]
 * Expected pixels/masks come from the reference C++ library (the vectors
 * are produced by make_test_vectors.py against tests/oracle.py). */
(function (factory) {
  if (typeof module === "object" && module.exports) module.exports = factory();
  else this.runConformance = factory();
})(function () {
  "use strict";
  var DT_CTOR = [Int8Array, Uint8Array, Int16Array, Uint16Array,
                 Int32Array, Uint32Array, Float32Array, Float64Array];

  return function runConformance(Lerc, vectors, fromB64) {
    var results = [];
    for (var vi = 0; vi < vectors.length; vi++) {
      var vec = vectors[vi];
      var name = vec.name;
      try {
        var blob = fromB64(vec.blob);
        var exp = vec.expected;
        var ab = blob.buffer.slice(blob.byteOffset, blob.byteOffset + blob.byteLength);
        var got = Lerc.decode(ab, { returnInterleaved: true });
        if (exp.depth > 1) {
          // default layout is band-sequential: verify the reorder
          var bsq = Lerc.decode(ab);
          var np = exp.width * exp.height;
          for (var b0 = 0; b0 < exp.bands; b0++)
            for (var i0 = 0; i0 < np; i0++)
              for (var d0 = 0; d0 < exp.depth; d0++) {
                var a0 = bsq.pixels[b0][d0 * np + i0];
                var e0 = got.pixels[b0][i0 * exp.depth + d0];
                if (a0 !== e0 && !(Number.isNaN(a0) && Number.isNaN(e0)))
                  throw new Error("BSQ reorder mismatch");
              }
        }
        if (got.width !== exp.width || got.height !== exp.height) throw new Error("shape mismatch");
        if (got.pixels.length !== exp.bands) throw new Error("band count " + got.pixels.length + " != " + exp.bands);
        for (var b = 0; b < exp.bands; b++) {
          var expBytes = fromB64(exp.pixels[b]);
          var expArr = new DT_CTOR[exp.dtype](expBytes.buffer, 0, exp.width * exp.height * exp.depth);
          var gotArr = got.pixels[b];
          if (gotArr.length !== expArr.length) throw new Error("pixel count mismatch band " + b);
          var mask = exp.masks ? fromB64(exp.masks[b]) : null;
          for (var i = 0; i < expArr.length; i++) {
            if (mask && !mask[Math.floor(i / exp.depth)]) continue; // invalid pixels unspecified
            var a = gotArr[i], e = expArr[i];
            if (a !== e && !(Number.isNaN(a) && Number.isNaN(e)))
              throw new Error("band " + b + " pixel " + i + ": got " + a + " expected " + e);
          }
          if (mask) {
            var gm = got.bandMasks ? got.bandMasks[b] : got.mask;
            if (!gm) throw new Error("missing mask band " + b);
            for (var j = 0; j < mask.length; j++)
              if ((gm[j] ? 1 : 0) !== mask[j]) throw new Error("mask mismatch band " + b + " px " + j);
          }
        }
        // header info cross-check
        var info = Lerc.getBlobInfo(blob);
        if (info.width !== exp.width || info.height !== exp.height || info.bandCount !== exp.bands)
          throw new Error("getBlobInfo mismatch");
        results.push({ name: name, ok: true });
      } catch (err) {
        results.push({ name: name, ok: false, error: String((err && err.message) || err) });
      }
    }
    // hostile probes: must throw, never hang or return garbage
    var cal = fromB64(find(vectors, "golden-california").blob);
    var bitflip = cal.slice(); bitflip[200] ^= 255;
    var hostile = [
      ["trunc40", cal.subarray(0, 40)],
      ["garbage", asciiBytes("garbagegarbagegarbagegarbage")],
      ["empty", new Uint8Array(0)],
      ["bitflip", bitflip],
    ];
    for (var hi = 0; hi < hostile.length; hi++) {
      var hname = hostile[hi][0], bad = hostile[hi][1];
      try {
        Lerc.decode(bad.buffer.slice(bad.byteOffset, bad.byteOffset + bad.byteLength));
        results.push({ name: "hostile-" + hname, ok: false, error: "accepted hostile blob" });
      } catch (e2) {
        results.push({ name: "hostile-" + hname, ok: true });
      }
    }
    return results;
  };

  function find(vectors, name) {
    for (var i = 0; i < vectors.length; i++)
      if (vectors[i].name === name) return vectors[i];
    throw new Error("vector not found: " + name);
  }

  function asciiBytes(s) {
    var u8 = new Uint8Array(s.length);
    for (var i = 0; i < s.length; i++) u8[i] = s.charCodeAt(i);
    return u8;
  }
});
