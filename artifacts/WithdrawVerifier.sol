// SPDX-License-Identifier: MIT
// GENERATED VERIFIER — do not edit.
// Rendered by zkos_tpu.proof.solidity.render_solidity_verifier from the
// same VerifyingKey as the executable Python twin (proof.codegen); the
// structure mirrors crates/halo2-verifier/templates/Halo2Verifier.sol.
pragma solidity ^0.8.26;

contract WithdrawVerifier {
    uint256 internal constant R = 21888242871839275222246405745257275088548364400416034343698204186575808495617;       // BN254 scalar field
    uint256 internal constant Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583;       // BN254 base field
    uint256 internal constant N = 2048;
    uint256 internal constant N_INV = 21877555253249509951141793242451973684696534144361143701928820297812832026625;
    uint256 internal constant OMEGA = 9396103202274256930945606623206526900461945684265495839012435492634193195103;
    uint256 internal constant OMEGA_INV = 19444693496467964793333684482470811869395409953158764080291550423779334624794;
    uint256 internal constant VK_DIGEST = 11354221499684901914071339074275912671188019528623859655065199058503730747403;
    uint256 internal constant NUM_ADVICE = 17;
    uint256 internal constant NUM_Z = 6;
    uint256 internal constant NUM_LOOKUPS = 1;
    uint256 internal constant NUM_QUOTIENTS = 4;
    int256  internal constant ROT_LAST = -6;
    uint256 internal constant G2_X0 = 10857046999023057135944570762232829481370756359578518086990519993285655852781;
    uint256 internal constant G2_X1 = 11559732032986387107991004021392285783925812861821192530917403151452391805634;
    uint256 internal constant G2_Y0 = 8495653923123431417604973247489272438418190587263600148770280649306958101930;
    uint256 internal constant G2_Y1 = 4082367875863433681332203403145435568316851327593401208105741076214120093531;
    uint256 internal constant SG2_X0 = 18253511544609001572866960948873128266198935669250718031100637619547827597184;
    uint256 internal constant SG2_X1 = 10764647077472957448033591885865458661573660819003350325268673957890498500987;
    uint256 internal constant SG2_Y0 = 19756181390911900613508142947142748782977087973617411469215564659012323409872;
    uint256 internal constant SG2_Y1 = 15207030507740967976352749097256929091435606784526748170016829002013506957017;
    uint256 internal constant FIXED_X_0 = 7525046287538429231772706371475395624956521256033097822482407063168450372590;
    uint256 internal constant FIXED_Y_0 = 9700187453120378677074726833885177995802464095790165065446229229653132214477;
    uint256 internal constant FIXED_X_1 = 1481322194583398264156246293436294729602157794130644259559188500175113436736;
    uint256 internal constant FIXED_Y_1 = 12104649103290909272858608094656407593546858122672791058691692581965265349770;
    uint256 internal constant FIXED_X_2 = 8831239664066848040923142239627732753879578267668216265478232745843499178819;
    uint256 internal constant FIXED_Y_2 = 11755705389056323709983062132539273443665249036946407209474109548278092785674;
    uint256 internal constant FIXED_X_3 = 1220494789730793226604523644507661066490730819957624483159604650403035250168;
    uint256 internal constant FIXED_Y_3 = 3315027119355293614616430456019666130117066317331527187303905815289961952966;
    uint256 internal constant FIXED_X_4 = 16676066408238417343389677497554889337958048375278239327947803548189578776625;
    uint256 internal constant FIXED_Y_4 = 21785554937213342494557271918837679515067797063875428334366786782363582625814;
    uint256 internal constant FIXED_X_5 = 16040723733286485120507224241568764933284709531985076445572040814598879187462;
    uint256 internal constant FIXED_Y_5 = 19665512835817745735329566240146512623475484345120526504251061258701676548868;
    uint256 internal constant FIXED_X_6 = 4664046755441254759708865526914195144597146399740927765281844902698151897429;
    uint256 internal constant FIXED_Y_6 = 16098365311615548615599708838816868697590584439112707391896484349181675514522;
    uint256 internal constant FIXED_X_7 = 2179992348075825517047326515783876178970148172338699604895000078858669726114;
    uint256 internal constant FIXED_Y_7 = 331669175337155465396955903161455056592478130271233532482731656241302190999;
    uint256 internal constant FIXED_X_8 = 6985341593347757338331160413044249905258479940806959660734678403063078446389;
    uint256 internal constant FIXED_Y_8 = 15522281326175578673304436821605313684469374517871932879503809833891805303347;
    uint256 internal constant FIXED_X_9 = 8495262482183254193089508180812520750341910542121488833324029978622105631345;
    uint256 internal constant FIXED_Y_9 = 20537181829713275725091862182786026746920468485731287855046992341025669027742;
    uint256 internal constant FIXED_X_10 = 17408327530392849255356988826530759820409796738814068577595501201670927564228;
    uint256 internal constant FIXED_Y_10 = 4098228059420632198450135698426979929962497103696668668622313214437796597105;
    uint256 internal constant FIXED_X_11 = 15431294852512883028240966414530712298127834678580180439246157265791270608469;
    uint256 internal constant FIXED_Y_11 = 641535221808228104800064690861379893681685850218588118670373969708282469370;
    uint256 internal constant FIXED_X_12 = 11529434197042969353100629273871078409626596856272468365476069253968344820951;
    uint256 internal constant FIXED_Y_12 = 1557122385534112212193534245040890006661609286259230771808216524675710458143;
    uint256 internal constant FIXED_X_13 = 7607644308580801485492979075370110363347867905667921048721735489874269207675;
    uint256 internal constant FIXED_Y_13 = 19945911627658027562589845053483857934775198331486073538538204977490430616581;
    uint256 internal constant FIXED_X_14 = 13635710794169544176280689841999001299795379584513645473213927935911097773554;
    uint256 internal constant FIXED_Y_14 = 3941644943612419916681106480384093615600323584596290564171719096071183413194;
    uint256 internal constant FIXED_X_15 = 13635710794169544176280689841999001299795379584513645473213927935911097773554;
    uint256 internal constant FIXED_Y_15 = 3941644943612419916681106480384093615600323584596290564171719096071183413194;
    uint256 internal constant FIXED_X_16 = 13635710794169544176280689841999001299795379584513645473213927935911097773554;
    uint256 internal constant FIXED_Y_16 = 3941644943612419916681106480384093615600323584596290564171719096071183413194;
    uint256 internal constant FIXED_X_17 = 5016154020478823360140870234833729692723518543380026251081753807025889150352;
    uint256 internal constant FIXED_Y_17 = 6205332161516371491399499767897271609207809990630287046507749889028291188970;
    uint256 internal constant FIXED_X_18 = 5016154020478823360140870234833729692723518543380026251081753807025889150352;
    uint256 internal constant FIXED_Y_18 = 6205332161516371491399499767897271609207809990630287046507749889028291188970;
    uint256 internal constant FIXED_X_19 = 3168861366130031600726369488771995418437394412365770803277819239820832142513;
    uint256 internal constant FIXED_Y_19 = 21409901707073362927092335730490331942864772495971970492022779923289135610260;
    uint256 internal constant FIXED_X_20 = 0;
    uint256 internal constant FIXED_Y_20 = 0;
    uint256 internal constant FIXED_X_21 = 0;
    uint256 internal constant FIXED_Y_21 = 0;
    uint256 internal constant FIXED_X_22 = 0;
    uint256 internal constant FIXED_Y_22 = 0;
    uint256 internal constant FIXED_X_23 = 0;
    uint256 internal constant FIXED_Y_23 = 0;
    uint256 internal constant FIXED_X_24 = 9102590121319964322208415028541799984361349760588362000211779004375944161089;
    uint256 internal constant FIXED_Y_24 = 13856125546877209187931511692485504272704379971882036212555085018586058184480;
    uint256 internal constant FIXED_X_25 = 2792665300969171872564941447494049220739997066457360635114675848956839629159;
    uint256 internal constant FIXED_Y_25 = 19688630479523217043423250987763988746835995165749182979578350732688649196036;
    uint256 internal constant FIXED_X_26 = 6427769946638081532196954127260174004273486433917520622007753828730686062435;
    uint256 internal constant FIXED_Y_26 = 10318206124670665278212750144961784454084713268394018222598946936313231545956;
    uint256 internal constant FIXED_X_27 = 9502647150654462084213160880550614887914931136366582779406028827663428244534;
    uint256 internal constant FIXED_Y_27 = 5157059018929948622965051028282234229006570715833467778250113170815590681544;

    // --- precompile helpers (Halo2Verifier.sol ec_* / pairing wrappers) ---
    function ecAdd(uint256 ax, uint256 ay, uint256 bx, uint256 by)
        internal view returns (uint256, uint256) {
        if (ax == 0 && ay == 0) return (bx, by);
        if (bx == 0 && by == 0) return (ax, ay);
        (bool ok, bytes memory out) = address(0x06).staticcall(
            abi.encode(ax, ay, bx, by));
        require(ok, "ecAdd");
        return abi.decode(out, (uint256, uint256));
    }

    function ecMul(uint256 px, uint256 py, uint256 k)
        internal view returns (uint256, uint256) {
        if (k == 0 || (px == 0 && py == 0)) return (0, 0);
        if (k == 1) return (px, py);
        (bool ok, bytes memory out) = address(0x07).staticcall(
            abi.encode(px, py, k));
        require(ok, "ecMul");
        return abi.decode(out, (uint256, uint256));
    }

    function inv(uint256 v) internal view returns (uint256) {
        (bool ok, bytes memory out) = address(0x05).staticcall(
            abi.encode(32, 32, 32, v, R - 2, R));
        require(ok, "modexp");
        return abi.decode(out, (uint256));
    }

    function rotPoint(uint256 x, int256 rot)
        internal view returns (uint256) {
        uint256 w = rot >= 0 ? OMEGA : OMEGA_INV;
        uint256 e = uint256(rot >= 0 ? rot : -rot);
        uint256 acc = x;
        for (uint256 i = 0; i < e; i++) acc = mulmod(acc, w, R);
        return acc;
    }

    // l_i(x) = zh * w^i * N_INV / (x - w^i); the caller supplies w^i
    // (built incrementally) and the batch-inverted denominator — the
    // O(i) omega loop + per-value modexp of the naive form cost ~300k
    // gas at k=11 (template :399-471 batches exactly like this)
    function lagW(uint256 zh, uint256 wi, uint256 dinv)
        internal pure returns (uint256) {
        return mulmod(mulmod(zh, wi, R), mulmod(N_INV, dinv, R), R);
    }

    // Montgomery batch inversion: one modexp for any number of values
    function batchInv(uint256[] memory v)
        internal view returns (uint256[] memory) {
        uint256 m = v.length;
        uint256[] memory pre = new uint256[](m);
        uint256 acc = 1;
        for (uint256 i = 0; i < m; i++) {
            pre[i] = acc;
            acc = mulmod(acc, v[i], R);
        }
        uint256 ai = inv(acc);
        uint256[] memory out = new uint256[](m);
        for (uint256 i = m; i > 0; i--) {
            out[i - 1] = mulmod(ai, pre[i - 1], R);
            ai = mulmod(ai, v[i - 1], R);
        }
        return out;
    }

    function interpAt(uint256[] memory pts, uint256[] memory vals,
                      uint256 mu) internal view returns (uint256) {
        if (pts.length == 1) return vals[0];
        uint256 acc;
        uint256[] memory dens = new uint256[](pts.length);
        for (uint256 i = 0; i < pts.length; i++) {
            uint256 den = 1;
            for (uint256 j = 0; j < pts.length; j++) {
                if (i == j) continue;
                den = mulmod(den, addmod(pts[i], R - pts[j], R), R);
            }
            dens[i] = den;
        }
        uint256[] memory dinv = batchInv(dens);
        for (uint256 i = 0; i < pts.length; i++) {
            uint256 num = 1;
            for (uint256 j = 0; j < pts.length; j++) {
                if (i == j) continue;
                num = mulmod(num, addmod(mu, R - pts[j], R), R);
            }
            acc = addmod(acc, mulmod(vals[i],
                mulmod(num, dinv[i], R), R), R);
        }
        return acc;
    }

    // --- transcript (Keccak256 FS; Halo2Verifier.sol:104-124) ---
    struct T { bytes buf; uint256 cptr; bytes proof; }

    function squeeze(T memory t) internal pure returns (uint256 c) {
        bytes32 h = keccak256(t.buf);
        t.buf = abi.encodePacked(h);
        c = uint256(h) % R;
    }

    function squeezeCont(T memory t) internal pure returns (uint256 c) {
        bytes32 h = keccak256(abi.encodePacked(t.buf, uint8(1)));
        t.buf = abi.encodePacked(h);
        c = uint256(h) % R;
    }

    function readScalar(T memory t) internal pure returns (uint256 v) {
        v = uint256(bytes32(slice(t.proof, t.cptr)));
        require(v < R, "scalar range");
        t.cptr += 32;
        t.buf = abi.encodePacked(t.buf, bytes32(v));
    }

    function readPoint(T memory t)
        internal pure returns (uint256 px, uint256 py) {
        px = uint256(bytes32(slice(t.proof, t.cptr)));
        py = uint256(bytes32(slice(t.proof, t.cptr + 32)));
        t.cptr += 64;
        require(px < Q && py < Q, "coord range");
        require(mulmod(py, py, Q) ==
                addmod(mulmod(px, mulmod(px, px, Q), Q), 3, Q), "on curve");
        t.buf = abi.encodePacked(t.buf, bytes32(px), bytes32(py));
    }

    function slice(bytes memory b, uint256 off)
        internal pure returns (bytes32 out) {
        assembly { out := mload(add(add(b, 0x20), off)) }
    }

    // --- the verification algorithm ---
    function verifyProof(bytes calldata proof, uint256[] calldata instances)
        external view returns (bool) {
        T memory t;
        t.proof = proof;
        t.buf = abi.encodePacked(bytes32(uint256(VK_DIGEST)));
        for (uint256 i = 0; i < instances.length; i++) {
            require(instances[i] < R, "instance range");
            t.buf = abi.encodePacked(t.buf, bytes32(instances[i]));
        }

        uint256[] memory adv = new uint256[](2 * NUM_ADVICE);
        for (uint256 i = 0; i < NUM_ADVICE; i++)
            (adv[2 * i], adv[2 * i + 1]) = readPoint(t);
        uint256 theta = squeeze(t);
        uint256[] memory lkp = new uint256[](4 * NUM_LOOKUPS);
        for (uint256 i = 0; i < NUM_LOOKUPS; i++) {
            (lkp[4 * i], lkp[4 * i + 1]) = readPoint(t);
            (lkp[4 * i + 2], lkp[4 * i + 3]) = readPoint(t);
        }
        uint256 beta = NUM_LOOKUPS > 0 ? squeeze(t) : squeezeCont(t);
        uint256 gamma = squeezeCont(t);
        uint256[] memory zc = new uint256[](2 * NUM_Z);
        for (uint256 i = 0; i < NUM_Z; i++)
            (zc[2 * i], zc[2 * i + 1]) = readPoint(t);
        uint256[] memory lkz = new uint256[](2 * NUM_LOOKUPS);
        for (uint256 i = 0; i < NUM_LOOKUPS; i++)
            (lkz[2 * i], lkz[2 * i + 1]) = readPoint(t);
        (uint256 randX, uint256 randY) = readPoint(t);
        uint256 y = squeeze(t);
        uint256[] memory qc2 = new uint256[](2 * NUM_QUOTIENTS);
        for (uint256 i = 0; i < NUM_QUOTIENTS; i++)
            (qc2[2 * i], qc2[2 * i + 1]) = readPoint(t);
        uint256 x = squeeze(t);

        uint256[] memory a = new uint256[](25);
        for (uint256 i = 0; i < 25; i++) a[i] = readScalar(t);
        uint256[] memory f = new uint256[](28);
        for (uint256 i = 0; i < 28; i++) f[i] = readScalar(t);
        uint256 randomEval = readScalar(t);
        uint256[] memory s = new uint256[](18);
        for (uint256 i = 0; i < 18; i++)
            s[i] = readScalar(t);
        uint256[] memory z = new uint256[](3 * NUM_Z);
        for (uint256 i = 0; i < NUM_Z; i++) {
            z[3 * i] = readScalar(t);
            z[3 * i + 1] = readScalar(t);
            if (i < NUM_Z - 1) z[3 * i + 2] = readScalar(t);
        }
        uint256[] memory lk = new uint256[](5 * NUM_LOOKUPS);
        for (uint256 i = 0; i < 5 * NUM_LOOKUPS; i++) lk[i] = readScalar(t);

        // Lagrange/instance machinery (template :399-471)
        uint256 xN = 1;
        {
            uint256 base = x; uint256 expn = N;
            while (expn > 0) {
                if (expn & 1 == 1) xN = mulmod(xN, base, R);
                base = mulmod(base, base, R); expn >>= 1;
            }
        }
        uint256 zh = addmod(xN, R - 1, R);
        uint256 instanceEval;
        uint256 l0; uint256 lLast; uint256 lBlind; uint256 zhInv;
        {
            // rows 0..n_inst-1 use w^i (incremental); the last/blinding
            // rows n-bl..n-1 use w^{-k} = OMEGA_INV^k — no O(n) loops
            uint256 bl = uint256(-ROT_LAST);
            uint256 m = instances.length + bl + 1;
            uint256[] memory dens = new uint256[](m);
            uint256[] memory ws = new uint256[](m);
            uint256 wi = 1;
            for (uint256 i = 0; i < instances.length; i++) {
                ws[i] = wi;
                dens[i] = addmod(x, R - wi, R);
                wi = mulmod(wi, OMEGA, R);
            }
            wi = OMEGA_INV;
            for (uint256 i = 0; i < bl; i++) {
                ws[instances.length + i] = wi;
                dens[instances.length + i] = addmod(x, R - wi, R);
                wi = mulmod(wi, OMEGA_INV, R);
            }
            dens[m - 1] = zh;
            uint256[] memory dinv = batchInv(dens);
            zhInv = dinv[m - 1];
            l0 = lagW(zh, ws[0], dinv[0]);
            for (uint256 i = 0; i < instances.length; i++)
                instanceEval = addmod(instanceEval, mulmod(instances[i],
                    lagW(zh, ws[i], dinv[i]), R), R);
            // descending rows n-1 .. n-bl: the last one is L_last
            lLast = lagW(zh, ws[m - 2], dinv[m - 2]);
            for (uint256 i = 0; i < bl - 1; i++)
                lBlind = addmod(lBlind, lagW(zh,
                    ws[instances.length + i],
                    dinv[instances.length + i]), R);
        }
        uint256 active = addmod(1, R - addmod(lLast, lBlind, R), R);

        // quotient numerator, y-Horner (evaluator.rs order)
        uint256 numer;
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[0], f[1], R), addmod(a[0], mulmod(f[2], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[0], f[3], R), addmod(a[1], mulmod(f[4], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[0], f[5], R), addmod(a[2], mulmod(f[6], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[0], f[7], R), addmod(a[3], mulmod(f[8], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[0], f[9], R), addmod(a[4], mulmod(f[10], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[0], f[11], R), addmod(a[5], mulmod(f[12], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[0], f[13], R), addmod(a[6], mulmod(f[14], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[0], f[15], R), addmod(a[7], mulmod(f[16], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[17], addmod(a[8], mulmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, mulmod(a[0], 0xa, R), R), mulmod(a[1], 0xe, R), R), mulmod(a[2], 0x2, R), R), mulmod(a[3], 0x6, R), R), mulmod(a[4], 0x5, R), R), mulmod(a[5], 0x7, R), R), mulmod(a[6], 0x1, R), R), mulmod(a[7], 0x3, R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[17], addmod(a[9], mulmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, mulmod(a[0], 0x8, R), R), mulmod(a[1], 0xc, R), R), mulmod(a[2], 0x2, R), R), mulmod(a[3], 0x2, R), R), mulmod(a[4], 0x4, R), R), mulmod(a[5], 0x6, R), R), mulmod(a[6], 0x1, R), R), mulmod(a[7], 0x1, R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[17], addmod(a[10], mulmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, mulmod(a[0], 0x2, R), R), mulmod(a[1], 0x6, R), R), mulmod(a[2], 0xa, R), R), mulmod(a[3], 0xe, R), R), mulmod(a[4], 0x1, R), R), mulmod(a[5], 0x3, R), R), mulmod(a[6], 0x5, R), R), mulmod(a[7], 0x7, R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[17], addmod(a[11], mulmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, mulmod(a[0], 0x2, R), R), mulmod(a[1], 0x2, R), R), mulmod(a[2], 0x8, R), R), mulmod(a[3], 0xc, R), R), mulmod(a[4], 0x1, R), R), mulmod(a[5], 0x1, R), R), mulmod(a[6], 0x4, R), R), mulmod(a[7], 0x6, R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[17], addmod(a[12], mulmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, mulmod(a[0], 0x5, R), R), mulmod(a[1], 0x7, R), R), mulmod(a[2], 0x1, R), R), mulmod(a[3], 0x3, R), R), mulmod(a[4], 0xa, R), R), mulmod(a[5], 0xe, R), R), mulmod(a[6], 0x2, R), R), mulmod(a[7], 0x6, R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[17], addmod(a[13], mulmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, mulmod(a[0], 0x4, R), R), mulmod(a[1], 0x6, R), R), mulmod(a[2], 0x1, R), R), mulmod(a[3], 0x1, R), R), mulmod(a[4], 0x8, R), R), mulmod(a[5], 0xc, R), R), mulmod(a[6], 0x2, R), R), mulmod(a[7], 0x2, R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[17], addmod(a[14], mulmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, mulmod(a[0], 0x1, R), R), mulmod(a[1], 0x3, R), R), mulmod(a[2], 0x5, R), R), mulmod(a[3], 0x7, R), R), mulmod(a[4], 0x2, R), R), mulmod(a[5], 0x6, R), R), mulmod(a[6], 0xa, R), R), mulmod(a[7], 0xe, R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[17], addmod(a[15], mulmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, mulmod(a[0], 0x1, R), R), mulmod(a[1], 0x1, R), R), mulmod(a[2], 0x4, R), R), mulmod(a[3], 0x6, R), R), mulmod(a[4], 0x2, R), R), mulmod(a[5], 0x2, R), R), mulmod(a[6], 0x8, R), R), mulmod(a[7], 0xc, R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[18], addmod(a[16], mulmod(mulmod(mulmod(addmod(a[0], f[2], R), addmod(a[0], f[2], R), R), addmod(a[0], f[2], R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[18], addmod(a[17], mulmod(mulmod(mulmod(addmod(a[1], f[4], R), addmod(a[1], f[4], R), R), addmod(a[1], f[4], R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[18], addmod(a[18], mulmod(mulmod(mulmod(addmod(a[2], f[6], R), addmod(a[2], f[6], R), R), addmod(a[2], f[6], R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[18], addmod(a[19], mulmod(mulmod(mulmod(addmod(a[3], f[8], R), addmod(a[3], f[8], R), R), addmod(a[3], f[8], R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[18], addmod(a[20], mulmod(mulmod(mulmod(addmod(a[4], f[10], R), addmod(a[4], f[10], R), R), addmod(a[4], f[10], R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[18], addmod(a[21], mulmod(mulmod(mulmod(addmod(a[5], f[12], R), addmod(a[5], f[12], R), R), addmod(a[5], f[12], R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[18], addmod(a[22], mulmod(mulmod(mulmod(addmod(a[6], f[14], R), addmod(a[6], f[14], R), R), addmod(a[6], f[14], R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[18], addmod(a[23], mulmod(mulmod(mulmod(addmod(a[7], f[16], R), addmod(a[7], f[16], R), R), addmod(a[7], f[16], R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[18], addmod(a[8], mulmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, mulmod(mulmod(mulmod(a[16], a[16], R), addmod(a[0], f[2], R), R), 0xa, R), R), mulmod(mulmod(mulmod(a[17], a[17], R), addmod(a[1], f[4], R), R), 0xe, R), R), mulmod(mulmod(mulmod(a[18], a[18], R), addmod(a[2], f[6], R), R), 0x2, R), R), mulmod(mulmod(mulmod(a[19], a[19], R), addmod(a[3], f[8], R), R), 0x6, R), R), mulmod(mulmod(mulmod(a[20], a[20], R), addmod(a[4], f[10], R), R), 0x5, R), R), mulmod(mulmod(mulmod(a[21], a[21], R), addmod(a[5], f[12], R), R), 0x7, R), R), mulmod(mulmod(mulmod(a[22], a[22], R), addmod(a[6], f[14], R), R), 0x1, R), R), mulmod(mulmod(mulmod(a[23], a[23], R), addmod(a[7], f[16], R), R), 0x3, R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[18], addmod(a[9], mulmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, mulmod(mulmod(mulmod(a[16], a[16], R), addmod(a[0], f[2], R), R), 0x8, R), R), mulmod(mulmod(mulmod(a[17], a[17], R), addmod(a[1], f[4], R), R), 0xc, R), R), mulmod(mulmod(mulmod(a[18], a[18], R), addmod(a[2], f[6], R), R), 0x2, R), R), mulmod(mulmod(mulmod(a[19], a[19], R), addmod(a[3], f[8], R), R), 0x2, R), R), mulmod(mulmod(mulmod(a[20], a[20], R), addmod(a[4], f[10], R), R), 0x4, R), R), mulmod(mulmod(mulmod(a[21], a[21], R), addmod(a[5], f[12], R), R), 0x6, R), R), mulmod(mulmod(mulmod(a[22], a[22], R), addmod(a[6], f[14], R), R), 0x1, R), R), mulmod(mulmod(mulmod(a[23], a[23], R), addmod(a[7], f[16], R), R), 0x1, R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[18], addmod(a[10], mulmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, mulmod(mulmod(mulmod(a[16], a[16], R), addmod(a[0], f[2], R), R), 0x2, R), R), mulmod(mulmod(mulmod(a[17], a[17], R), addmod(a[1], f[4], R), R), 0x6, R), R), mulmod(mulmod(mulmod(a[18], a[18], R), addmod(a[2], f[6], R), R), 0xa, R), R), mulmod(mulmod(mulmod(a[19], a[19], R), addmod(a[3], f[8], R), R), 0xe, R), R), mulmod(mulmod(mulmod(a[20], a[20], R), addmod(a[4], f[10], R), R), 0x1, R), R), mulmod(mulmod(mulmod(a[21], a[21], R), addmod(a[5], f[12], R), R), 0x3, R), R), mulmod(mulmod(mulmod(a[22], a[22], R), addmod(a[6], f[14], R), R), 0x5, R), R), mulmod(mulmod(mulmod(a[23], a[23], R), addmod(a[7], f[16], R), R), 0x7, R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[18], addmod(a[11], mulmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, mulmod(mulmod(mulmod(a[16], a[16], R), addmod(a[0], f[2], R), R), 0x2, R), R), mulmod(mulmod(mulmod(a[17], a[17], R), addmod(a[1], f[4], R), R), 0x2, R), R), mulmod(mulmod(mulmod(a[18], a[18], R), addmod(a[2], f[6], R), R), 0x8, R), R), mulmod(mulmod(mulmod(a[19], a[19], R), addmod(a[3], f[8], R), R), 0xc, R), R), mulmod(mulmod(mulmod(a[20], a[20], R), addmod(a[4], f[10], R), R), 0x1, R), R), mulmod(mulmod(mulmod(a[21], a[21], R), addmod(a[5], f[12], R), R), 0x1, R), R), mulmod(mulmod(mulmod(a[22], a[22], R), addmod(a[6], f[14], R), R), 0x4, R), R), mulmod(mulmod(mulmod(a[23], a[23], R), addmod(a[7], f[16], R), R), 0x6, R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[18], addmod(a[12], mulmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, mulmod(mulmod(mulmod(a[16], a[16], R), addmod(a[0], f[2], R), R), 0x5, R), R), mulmod(mulmod(mulmod(a[17], a[17], R), addmod(a[1], f[4], R), R), 0x7, R), R), mulmod(mulmod(mulmod(a[18], a[18], R), addmod(a[2], f[6], R), R), 0x1, R), R), mulmod(mulmod(mulmod(a[19], a[19], R), addmod(a[3], f[8], R), R), 0x3, R), R), mulmod(mulmod(mulmod(a[20], a[20], R), addmod(a[4], f[10], R), R), 0xa, R), R), mulmod(mulmod(mulmod(a[21], a[21], R), addmod(a[5], f[12], R), R), 0xe, R), R), mulmod(mulmod(mulmod(a[22], a[22], R), addmod(a[6], f[14], R), R), 0x2, R), R), mulmod(mulmod(mulmod(a[23], a[23], R), addmod(a[7], f[16], R), R), 0x6, R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[18], addmod(a[13], mulmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, mulmod(mulmod(mulmod(a[16], a[16], R), addmod(a[0], f[2], R), R), 0x4, R), R), mulmod(mulmod(mulmod(a[17], a[17], R), addmod(a[1], f[4], R), R), 0x6, R), R), mulmod(mulmod(mulmod(a[18], a[18], R), addmod(a[2], f[6], R), R), 0x1, R), R), mulmod(mulmod(mulmod(a[19], a[19], R), addmod(a[3], f[8], R), R), 0x1, R), R), mulmod(mulmod(mulmod(a[20], a[20], R), addmod(a[4], f[10], R), R), 0x8, R), R), mulmod(mulmod(mulmod(a[21], a[21], R), addmod(a[5], f[12], R), R), 0xc, R), R), mulmod(mulmod(mulmod(a[22], a[22], R), addmod(a[6], f[14], R), R), 0x2, R), R), mulmod(mulmod(mulmod(a[23], a[23], R), addmod(a[7], f[16], R), R), 0x2, R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[18], addmod(a[14], mulmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, mulmod(mulmod(mulmod(a[16], a[16], R), addmod(a[0], f[2], R), R), 0x1, R), R), mulmod(mulmod(mulmod(a[17], a[17], R), addmod(a[1], f[4], R), R), 0x3, R), R), mulmod(mulmod(mulmod(a[18], a[18], R), addmod(a[2], f[6], R), R), 0x5, R), R), mulmod(mulmod(mulmod(a[19], a[19], R), addmod(a[3], f[8], R), R), 0x7, R), R), mulmod(mulmod(mulmod(a[20], a[20], R), addmod(a[4], f[10], R), R), 0x2, R), R), mulmod(mulmod(mulmod(a[21], a[21], R), addmod(a[5], f[12], R), R), 0x6, R), R), mulmod(mulmod(mulmod(a[22], a[22], R), addmod(a[6], f[14], R), R), 0xa, R), R), mulmod(mulmod(mulmod(a[23], a[23], R), addmod(a[7], f[16], R), R), 0xe, R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[18], addmod(a[15], mulmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, mulmod(mulmod(mulmod(a[16], a[16], R), addmod(a[0], f[2], R), R), 0x1, R), R), mulmod(mulmod(mulmod(a[17], a[17], R), addmod(a[1], f[4], R), R), 0x1, R), R), mulmod(mulmod(mulmod(a[18], a[18], R), addmod(a[2], f[6], R), R), 0x4, R), R), mulmod(mulmod(mulmod(a[19], a[19], R), addmod(a[3], f[8], R), R), 0x6, R), R), mulmod(mulmod(mulmod(a[20], a[20], R), addmod(a[4], f[10], R), R), 0x2, R), R), mulmod(mulmod(mulmod(a[21], a[21], R), addmod(a[5], f[12], R), R), 0x2, R), R), mulmod(mulmod(mulmod(a[22], a[22], R), addmod(a[6], f[14], R), R), 0x8, R), R), mulmod(mulmod(mulmod(a[23], a[23], R), addmod(a[7], f[16], R), R), 0xc, R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[19], addmod(a[16], mulmod(mulmod(mulmod(addmod(a[0], f[2], R), addmod(a[0], f[2], R), R), addmod(a[0], f[2], R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[19], addmod(a[8], mulmod(addmod(mulmod(mulmod(mulmod(a[16], a[16], R), addmod(a[0], f[2], R), R), 0x2107f5cf79a11c871aed7da43074f84648a941ba6612a793cd988da73afb1a71, R), addmod(mulmod(mulmod(a[16], a[16], R), addmod(a[0], f[2], R), R), addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, a[1], R), a[2], R), a[3], R), a[4], R), a[5], R), a[6], R), a[7], R), R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[19], addmod(a[9], mulmod(addmod(mulmod(a[1], 0x29ab8490077f26752b1f4c367a98027e329127f4e14551f080a3e0fa1ec2ba54, R), addmod(mulmod(mulmod(a[16], a[16], R), addmod(a[0], f[2], R), R), addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, a[1], R), a[2], R), a[3], R), a[4], R), a[5], R), a[6], R), a[7], R), R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[19], addmod(a[10], mulmod(addmod(mulmod(a[2], 0x67ec7e2a41250eaf5bea19a8840f650db3f551f9c51c828d465a1c85dd9d048, R), addmod(mulmod(mulmod(a[16], a[16], R), addmod(a[0], f[2], R), R), addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, a[1], R), a[2], R), a[3], R), a[4], R), a[5], R), a[6], R), a[7], R), R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[19], addmod(a[11], mulmod(addmod(mulmod(a[3], 0x24df6b655b777cf543d766cf2c2d859b0cf6c6e13ddf34c9763968e5b48a7630, R), addmod(mulmod(mulmod(a[16], a[16], R), addmod(a[0], f[2], R), R), addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, a[1], R), a[2], R), a[3], R), a[4], R), a[5], R), a[6], R), a[7], R), R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[19], addmod(a[12], mulmod(addmod(mulmod(a[4], 0x1e21a13937d6d0e1d523ad746679ab8821e8e3dc4c3e7e623bd8f683fd40975, R), addmod(mulmod(mulmod(a[16], a[16], R), addmod(a[0], f[2], R), R), addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, a[1], R), a[2], R), a[3], R), a[4], R), a[5], R), a[6], R), a[7], R), R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[19], addmod(a[13], mulmod(addmod(mulmod(a[5], 0x1ade4882c00b5e5f5d81aff15978a3a39d5e18eda982781a9a520d0c8b2bc282, R), addmod(mulmod(mulmod(a[16], a[16], R), addmod(a[0], f[2], R), R), addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, a[1], R), a[2], R), a[3], R), a[4], R), a[5], R), a[6], R), a[7], R), R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[19], addmod(a[14], mulmod(addmod(mulmod(a[6], 0x2015ab9b1ca880207659fca9facdb10fe4dcb28892e15fe363bff3c7f286bd5d, R), addmod(mulmod(mulmod(a[16], a[16], R), addmod(a[0], f[2], R), R), addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, a[1], R), a[2], R), a[3], R), a[4], R), a[5], R), a[6], R), a[7], R), R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[19], addmod(a[15], mulmod(addmod(mulmod(a[7], 0x30f4266095db3b3f5dc9d93da3766fae31a6e540c5c85c8b5d18f1d86333d11, R), addmod(mulmod(mulmod(a[16], a[16], R), addmod(a[0], f[2], R), R), addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, a[1], R), a[2], R), a[3], R), a[4], R), a[5], R), a[6], R), a[7], R), R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[20], a[16], R), addmod(a[16], mulmod(0x1, 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[20], a[17], R), addmod(a[17], mulmod(0x1, 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[20], a[18], R), addmod(a[18], mulmod(0x1, 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[20], a[19], R), addmod(a[19], mulmod(0x1, 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[20], a[20], R), addmod(a[20], mulmod(0x1, 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[20], a[21], R), addmod(a[21], mulmod(0x1, 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[20], a[22], R), addmod(a[22], mulmod(0x1, 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[20], a[23], R), addmod(a[23], mulmod(0x1, 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[20], addmod(a[8], mulmod(addmod(mulmod(a[0], 0x100, R), addmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, mulmod(a[16], 0x80, R), R), mulmod(a[17], 0x40, R), R), mulmod(a[18], 0x20, R), R), mulmod(a[19], 0x10, R), R), mulmod(a[20], 0x8, R), R), mulmod(a[21], 0x4, R), R), mulmod(a[22], 0x2, R), R), mulmod(a[23], 0x1, R), R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[21], addmod(mulmod(mulmod(addmod(a[2], mulmod(a[0], 0x2, R), R), mulmod(a[1], 0x2, R), R), mulmod(a[1], 0x2, R), R), mulmod(mulmod(mulmod(mulmod(a[0], 0x3, R), a[0], R), mulmod(mulmod(a[0], 0x3, R), a[0], R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[21], addmod(mulmod(addmod(a[3], a[1], R), mulmod(a[1], 0x2, R), R), mulmod(mulmod(mulmod(mulmod(a[0], 0x3, R), a[0], R), addmod(a[0], mulmod(a[2], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[21], addmod(mulmod(mulmod(addmod(addmod(a[4], a[2], R), a[6], R), addmod(a[6], mulmod(a[2], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), addmod(a[6], mulmod(a[2], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), mulmod(mulmod(addmod(a[7], mulmod(a[3], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), addmod(a[7], mulmod(a[3], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[21], addmod(mulmod(addmod(a[5], a[3], R), addmod(a[6], mulmod(a[2], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), mulmod(mulmod(addmod(a[7], mulmod(a[3], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), addmod(a[2], mulmod(a[4], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[21], addmod(a[8], mulmod(addmod(mulmod(a[16], a[4], R), mulmod(addmod(0x1, mulmod(a[16], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), a[2], R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[21], addmod(a[9], mulmod(addmod(mulmod(a[16], a[5], R), mulmod(addmod(0x1, mulmod(a[16], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), a[3], R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[22], addmod(mulmod(mulmod(addmod(addmod(a[4], a[0], R), a[2], R), addmod(a[2], mulmod(a[0], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), addmod(a[2], mulmod(a[0], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), mulmod(mulmod(addmod(a[3], mulmod(a[1], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), addmod(a[3], mulmod(a[1], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[22], addmod(mulmod(addmod(a[5], a[1], R), addmod(a[2], mulmod(a[0], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), mulmod(mulmod(addmod(a[3], mulmod(a[1], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), addmod(a[0], mulmod(a[4], 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[23], addmod(mulmod(a[1], a[1], R), mulmod(addmod(mulmod(mulmod(a[0], a[0], R), a[0], R), mulmod(0x11, 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[24], a[16], R), addmod(a[16], mulmod(0x1, 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[24], a[17], R), addmod(a[17], mulmod(0x1, 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[24], a[18], R), addmod(a[18], mulmod(0x1, 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[24], a[19], R), addmod(a[19], mulmod(0x1, 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[24], a[20], R), addmod(a[20], mulmod(0x1, 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[24], a[21], R), addmod(a[21], mulmod(0x1, 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(f[24], a[22], R), addmod(a[22], mulmod(0x1, 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[24], addmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, a[16], R), a[17], R), a[18], R), a[19], R), a[20], R), a[21], R), a[22], R), mulmod(0x1, 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[24], addmod(a[7], mulmod(addmod(addmod(addmod(addmod(addmod(addmod(addmod(0x0, mulmod(a[16], a[0], R), R), mulmod(a[17], a[1], R), R), mulmod(a[18], a[2], R), R), mulmod(a[19], a[3], R), R), mulmod(a[20], a[4], R), R), mulmod(a[21], a[5], R), R), mulmod(a[22], a[6], R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[25], addmod(a[2], mulmod(addmod(a[0], mulmod(f[2], a[1], R), R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(f[26], addmod(a[15], mulmod(addmod(mulmod(a[7], 0x100, R), a[24], R), 0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000, R), R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(l0, addmod(1, R - z[0], R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(lLast, addmod(mulmod(z[15], z[15], R), R - z[15], R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(l0, addmod(z[3], R - z[2], R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(l0, addmod(z[6], R - z[5], R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(l0, addmod(z[9], R - z[8], R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(l0, addmod(z[12], R - z[11], R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(l0, addmod(z[15], R - z[14], R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(addmod(mulmod(mulmod(mulmod(z[1], addmod(addmod(a[0], mulmod(beta, s[0], R), R), gamma, R), R), addmod(addmod(a[1], mulmod(beta, s[1], R), R), gamma, R), R), addmod(addmod(a[2], mulmod(beta, s[2], R), R), gamma, R), R), R - mulmod(mulmod(mulmod(z[0], addmod(addmod(a[0], mulmod(mulmod(beta, 0x1, R), x, R), R), gamma, R), R), addmod(addmod(a[1], mulmod(mulmod(beta, 0x9226b6e22c6f0ca64ec26aad4c86e715b5f898e5e963f25870e56bbe533e9a2, R), x, R), R), gamma, R), R), addmod(addmod(a[2], mulmod(mulmod(beta, 0x13b360d4e82fe915fed16081038f98c211427b87a281bd733c277dbadf10372b, R), x, R), R), gamma, R), R), R), active, R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(addmod(mulmod(mulmod(mulmod(z[4], addmod(addmod(a[3], mulmod(beta, s[3], R), R), gamma, R), R), addmod(addmod(a[4], mulmod(beta, s[4], R), R), gamma, R), R), addmod(addmod(a[5], mulmod(beta, s[5], R), R), gamma, R), R), R - mulmod(mulmod(mulmod(z[3], addmod(addmod(a[3], mulmod(mulmod(beta, 0x18afdf23e9bd9302673fc1e076a492d4d65bd18ebc4d854ed189139bab313e52, R), x, R), R), gamma, R), R), addmod(addmod(a[4], mulmod(mulmod(beta, 0xa136ba13afa6c83eb7b82fb370e228e74155e48fb8f1c1cfc33fb0da8afb42, R), x, R), R), gamma, R), R), addmod(addmod(a[5], mulmod(mulmod(beta, 0x2eb9750dce545f17d492058dd201a1251ff3d9077864583d44eaf9be9008699d, R), x, R), R), gamma, R), R), R), active, R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(addmod(mulmod(mulmod(mulmod(z[7], addmod(addmod(a[6], mulmod(beta, s[6], R), R), gamma, R), R), addmod(addmod(a[7], mulmod(beta, s[7], R), R), gamma, R), R), addmod(addmod(a[16], mulmod(beta, s[8], R), R), gamma, R), R), R - mulmod(mulmod(mulmod(z[6], addmod(addmod(a[6], mulmod(mulmod(beta, 0xc700e936f498cfaff7ab722787c51d54dbe76b8dbb8e572533863af6c71421b, R), x, R), R), gamma, R), R), addmod(addmod(a[7], mulmod(mulmod(beta, 0x20829506b7e62e46ebf2c61ecaf667e359da59b78c260763a18fcc1ad860484b, R), x, R), R), gamma, R), R), addmod(addmod(a[16], mulmod(mulmod(beta, 0x127220418384eaa9e330d35906da828acb3210be240533d24a4d7eb04830e527, R), x, R), R), gamma, R), R), R), active, R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(addmod(mulmod(mulmod(mulmod(z[10], addmod(addmod(a[17], mulmod(beta, s[9], R), R), gamma, R), R), addmod(addmod(a[18], mulmod(beta, s[10], R), R), gamma, R), R), addmod(addmod(a[19], mulmod(beta, s[11], R), R), gamma, R), R), R - mulmod(mulmod(mulmod(z[9], addmod(addmod(a[17], mulmod(mulmod(beta, 0x2e4509f8f6c35e91cc0a4514f9d68cc7fea12e5ee3a0160c98f527dc8c2ee014, R), x, R), R), gamma, R), R), addmod(addmod(a[18], mulmod(mulmod(beta, 0x23085238711040a2f18d1c4834a30a6c126ddfcaab38fa78cb9bf80d1c186607, R), x, R), R), gamma, R), R), addmod(addmod(a[19], mulmod(mulmod(beta, 0x11c96424532a957bc91cd11a9249e21ce9558f13c27a63a36f014a2a1123c0e0, R), x, R), R), gamma, R), R), R), active, R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(addmod(mulmod(mulmod(mulmod(z[13], addmod(addmod(a[20], mulmod(beta, s[12], R), R), gamma, R), R), addmod(addmod(a[21], mulmod(beta, s[13], R), R), gamma, R), R), addmod(addmod(a[22], mulmod(beta, s[14], R), R), gamma, R), R), R - mulmod(mulmod(mulmod(z[12], addmod(addmod(a[20], mulmod(mulmod(beta, 0x543fa4ce0e5f85d1f5cf149ea332d9b5a838b194915342a2c230c4a3d8848b6, R), x, R), R), gamma, R), R), addmod(addmod(a[21], mulmod(mulmod(beta, 0x10ff36da7f533f23b96856303fce887def1eee75d4159f2e16010d477417cfe2, R), x, R), R), gamma, R), R), addmod(addmod(a[22], mulmod(mulmod(beta, 0x29a7d6fb903432024bae45f3ef304cc8c5ad7e698e44aeed5d9540071219d08b, R), x, R), R), gamma, R), R), R), active, R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(addmod(mulmod(mulmod(mulmod(z[16], addmod(addmod(a[23], mulmod(beta, s[15], R), R), gamma, R), R), addmod(addmod(a[24], mulmod(beta, s[16], R), R), gamma, R), R), addmod(addmod(instanceEval, mulmod(beta, s[17], R), R), gamma, R), R), R - mulmod(mulmod(mulmod(z[15], addmod(addmod(a[23], mulmod(mulmod(beta, 0x2a718aeae3556b3f2662fda78914bf7cdd893f7ed248860efcdc6a6519621f0d, R), x, R), R), gamma, R), R), addmod(addmod(a[24], mulmod(mulmod(beta, 0x914ca113c21f1c0085d16ba9f0c34c6c0057e6ea1b35294395df9407a283f74, R), x, R), R), gamma, R), R), addmod(addmod(instanceEval, mulmod(mulmod(beta, 0x1dfd50dbe70fb1277ad65415b9ffe9e9e7fb6d6050fcb7cd1159f9366cb3430e, R), x, R), R), gamma, R), R), R), active, R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(l0, addmod(1, R - lk[0], R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(lLast, addmod(mulmod(lk[0], lk[0], R), R - lk[0], R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(addmod(mulmod(lk[1], mulmod(addmod(lk[2], beta, R), addmod(lk[4], gamma, R), R), R), R - mulmod(lk[0], mulmod(addmod(a[24], beta, R), addmod(f[27], gamma, R), R), R), R), active, R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(l0, addmod(lk[2], R - lk[4], R), R), R);
        numer = addmod(mulmod(numer, y, R), mulmod(mulmod(addmod(lk[2], R - lk[4], R), addmod(lk[2], R - lk[3], R), R), active, R), R);
        uint256 quotientEval = mulmod(numer, zhInv, R);

        // fold quotient commitment by x^n (template :496-514)
        uint256 qcX = qc2[2 * (NUM_QUOTIENTS - 1)];
        uint256 qcY = qc2[2 * (NUM_QUOTIENTS - 1) + 1];
        for (uint256 i = NUM_QUOTIENTS - 1; i > 0; i--) {
            (qcX, qcY) = ecMul(qcX, qcY, xN);
            (qcX, qcY) = ecAdd(qcX, qcY, qc2[2 * (i - 1)], qc2[2 * i - 1]);
        }

        // BDFG21 (pcs/bdfg21.rs)
        uint256 zeta = squeeze(t);
        uint256 nu = squeezeCont(t);
        (uint256 wX, uint256 wY) = readPoint(t);
        uint256 mu = squeeze(t);
        (uint256 wpX, uint256 wpY) = readPoint(t);
        require(t.cptr == proof.length, "proof length");

        uint256 fX; uint256 fY; uint256 rTotal; uint256 nuPow = 1;
        uint256 tx_; uint256 ty_;
        uint256 z0Mu = 1;
        z0Mu = mulmod(z0Mu, addmod(mu, R - rotPoint(x, 0), R), R);
        z0Mu = mulmod(z0Mu, addmod(mu, R - rotPoint(x, 1), R), R);
        uint256[] memory zsArr = new uint256[](4);
        {
            uint256 zp_ = 1;
            zp_ = mulmod(zp_, addmod(mu, R - rotPoint(x, 0), R), R);
            zp_ = mulmod(zp_, addmod(mu, R - rotPoint(x, 1), R), R);
            zsArr[0] = zp_;
        }
        {
            uint256 zp_ = 1;
            zp_ = mulmod(zp_, addmod(mu, R - rotPoint(x, 0), R), R);
            zsArr[1] = zp_;
        }
        {
            uint256 zp_ = 1;
            zp_ = mulmod(zp_, addmod(mu, R - rotPoint(x, -6), R), R);
            zp_ = mulmod(zp_, addmod(mu, R - rotPoint(x, 0), R), R);
            zp_ = mulmod(zp_, addmod(mu, R - rotPoint(x, 1), R), R);
            zsArr[2] = zp_;
        }
        {
            uint256 zp_ = 1;
            zp_ = mulmod(zp_, addmod(mu, R - rotPoint(x, -1), R), R);
            zp_ = mulmod(zp_, addmod(mu, R - rotPoint(x, 0), R), R);
            zsArr[3] = zp_;
        }
        uint256[] memory zsInvArr = batchInv(zsArr);
        // rotation set 0: rotations [0, 1]
        {
            uint256 zp = mulmod(nuPow, mulmod(z0Mu, zsInvArr[0], R), R);
            uint256[] memory ce = new uint256[](2);
            uint256[] memory pts = new uint256[](2);
            pts[0] = rotPoint(x, 0);
            pts[1] = rotPoint(x, 1);
            (tx_, ty_) = (adv[0], adv[1]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, a[0], R), R);
            ce[1] = addmod(ce[1], mulmod(zp, a[8], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (adv[2], adv[3]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, a[1], R), R);
            ce[1] = addmod(ce[1], mulmod(zp, a[9], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (adv[4], adv[5]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, a[2], R), R);
            ce[1] = addmod(ce[1], mulmod(zp, a[10], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (adv[6], adv[7]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, a[3], R), R);
            ce[1] = addmod(ce[1], mulmod(zp, a[11], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (adv[8], adv[9]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, a[4], R), R);
            ce[1] = addmod(ce[1], mulmod(zp, a[12], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (adv[10], adv[11]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, a[5], R), R);
            ce[1] = addmod(ce[1], mulmod(zp, a[13], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (adv[12], adv[13]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, a[6], R), R);
            ce[1] = addmod(ce[1], mulmod(zp, a[14], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (adv[14], adv[15]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, a[7], R), R);
            ce[1] = addmod(ce[1], mulmod(zp, a[15], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (zc[10], zc[11]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, z[15], R), R);
            ce[1] = addmod(ce[1], mulmod(zp, z[16], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (lkz[0], lkz[1]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, lk[0], R), R);
            ce[1] = addmod(ce[1], mulmod(zp, lk[1], R), R);
            zp = mulmod(zp, zeta, R);
            rTotal = addmod(rTotal, interpAt(pts, ce, mu), R);
            nuPow = mulmod(nuPow, nu, R);
        }
        // rotation set 1: rotations [0]
        {
            uint256 zp = mulmod(nuPow, mulmod(z0Mu, zsInvArr[1], R), R);
            uint256[] memory ce = new uint256[](1);
            uint256[] memory pts = new uint256[](1);
            pts[0] = rotPoint(x, 0);
            (tx_, ty_) = (adv[16], adv[17]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, a[16], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (adv[18], adv[19]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, a[17], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (adv[20], adv[21]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, a[18], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (adv[22], adv[23]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, a[19], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (adv[24], adv[25]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, a[20], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (adv[26], adv[27]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, a[21], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (adv[28], adv[29]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, a[22], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (adv[30], adv[31]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, a[23], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (adv[32], adv[33]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, a[24], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (lkp[2], lkp[3]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, lk[4], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (15431294852512883028240966414530712298127834678580180439246157265791270608469, 641535221808228104800064690861379893681685850218588118670373969708282469370);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[0], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (11529434197042969353100629273871078409626596856272468365476069253968344820951, 1557122385534112212193534245040890006661609286259230771808216524675710458143);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[1], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (7525046287538429231772706371475395624956521256033097822482407063168450372590, 9700187453120378677074726833885177995802464095790165065446229229653132214477);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[2], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (7607644308580801485492979075370110363347867905667921048721735489874269207675, 19945911627658027562589845053483857934775198331486073538538204977490430616581);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[3], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (1481322194583398264156246293436294729602157794130644259559188500175113436736, 12104649103290909272858608094656407593546858122672791058691692581965265349770);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[4], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (13635710794169544176280689841999001299795379584513645473213927935911097773554, 3941644943612419916681106480384093615600323584596290564171719096071183413194);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[5], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (8831239664066848040923142239627732753879578267668216265478232745843499178819, 11755705389056323709983062132539273443665249036946407209474109548278092785674);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[6], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (13635710794169544176280689841999001299795379584513645473213927935911097773554, 3941644943612419916681106480384093615600323584596290564171719096071183413194);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[7], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (1220494789730793226604523644507661066490730819957624483159604650403035250168, 3315027119355293614616430456019666130117066317331527187303905815289961952966);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[8], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (13635710794169544176280689841999001299795379584513645473213927935911097773554, 3941644943612419916681106480384093615600323584596290564171719096071183413194);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[9], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (16676066408238417343389677497554889337958048375278239327947803548189578776625, 21785554937213342494557271918837679515067797063875428334366786782363582625814);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[10], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (5016154020478823360140870234833729692723518543380026251081753807025889150352, 6205332161516371491399499767897271609207809990630287046507749889028291188970);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[11], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (16040723733286485120507224241568764933284709531985076445572040814598879187462, 19665512835817745735329566240146512623475484345120526504251061258701676548868);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[12], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (5016154020478823360140870234833729692723518543380026251081753807025889150352, 6205332161516371491399499767897271609207809990630287046507749889028291188970);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[13], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (4664046755441254759708865526914195144597146399740927765281844902698151897429, 16098365311615548615599708838816868697590584439112707391896484349181675514522);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[14], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (3168861366130031600726369488771995418437394412365770803277819239820832142513, 21409901707073362927092335730490331942864772495971970492022779923289135610260);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[15], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (2179992348075825517047326515783876178970148172338699604895000078858669726114, 331669175337155465396955903161455056592478130271233532482731656241302190999);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[16], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (6985341593347757338331160413044249905258479940806959660734678403063078446389, 15522281326175578673304436821605313684469374517871932879503809833891805303347);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[17], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (8495262482183254193089508180812520750341910542121488833324029978622105631345, 20537181829713275725091862182786026746920468485731287855046992341025669027742);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[18], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (17408327530392849255356988826530759820409796738814068577595501201670927564228, 4098228059420632198450135698426979929962497103696668668622313214437796597105);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[19], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (0, 0);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[20], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (0, 0);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[21], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (0, 0);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[22], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (0, 0);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[23], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (9102590121319964322208415028541799984361349760588362000211779004375944161089, 13856125546877209187931511692485504272704379971882036212555085018586058184480);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[24], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (2792665300969171872564941447494049220739997066457360635114675848956839629159, 19688630479523217043423250987763988746835995165749182979578350732688649196036);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[25], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (9502647150654462084213160880550614887914931136366582779406028827663428244534, 5157059018929948622965051028282234229006570715833467778250113170815590681544);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[26], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (6427769946638081532196954127260174004273486433917520622007753828730686062435, 10318206124670665278212750144961784454084713268394018222598946936313231545956);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, f[27], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (7502303034987187005077656465847730755195914753304067407897691886519803200341, 11362792646717395410156893560764798520919320425614990907810832573786642456584);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, s[0], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (8442947630608431499264662695554306540302876433251458644504432491811157654269, 10510122981409942067902112508551891753155943641806130210396664039008274647296);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, s[1], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (17716206839103032317607460211154281856197762050525247680327116856305762423567, 19569167073323022262405967191291171155043501057310484415791848707448711980435);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, s[2], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (13408405524191671536171931203376156488265373974604813115583446439530351497305, 13762724765291475106821245502444415404850089740534680467556064140812442410596);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, s[3], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (14832469615978540364061772609948956403007277090372662454922771812353454481629, 14634942771195424704202992338935912211214446714873089621443128814616607573198);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, s[4], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (8183751720260794449150059312359643059766759861312833967624336680576254929565, 9865883350261016641012360930380851631297334105383502406861378615532620439694);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, s[5], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (11536989761520356225980924626407966296879522005334868689364004191422108500104, 19188474585955407555365946620151798054521366033047222639985821776449008692714);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, s[6], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (20318528108778371758074006870125851412284638266353614275777855351831032659785, 7900945160976937374139865294003573133080178872138911291603641550813846402252);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, s[7], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (4714279661863035741371084394880419524287397256785781112622936917525607040176, 20156746969217662369529787139522943201647002832906175135750098836834714231174);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, s[8], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (12214869768576465737320041609912413735614877637966973847019065725069890071178, 21832414048286207978334234135715378692432141890776010023633012014067657078797);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, s[9], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (18679894649619847921464357536547392415877510883786012993196681695405033494481, 19002683524858699105733946378657595936488715182331540876438770582864210016024);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, s[10], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (2929738294769775085868747876808689752981058118515824520789118120178653704071, 10643341758704351960803201419462127158780322682037223928962950176071406994880);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, s[11], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (21286086877113261528551232837732322164264459169575962694077633486989956138448, 21801723085948977172671461392044835558033917081453091659581941482974505602459);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, s[12], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (20682157806372383227003142003281378700888791161662955856069899466185159833144, 17303474010430214604763772678333257414310805790161454946225918882559673709673);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, s[13], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (11380050293726425311350240944944411762569336749609644759001139153152712662908, 12564426972160639743851516318383625110764111664565439273719436565436085418846);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, s[14], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (3564658903771346821482057500597383393986742015305550730598463987051139938360, 1617584497777626165492950824555821605300551404803940428352025064158779403419);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, s[15], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (18903645120140266176569577643905051395380103816523075129000350587585153834988, 19362635871824219850430755451540860600161736255084601596866057695838259770996);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, s[16], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (12212990627391114733577878871000229905294710804998184325051706156200669152098, 12250291003723675014645007488665375730995161089973086964067930155900285631307);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, s[17], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (qcX, qcY);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, quotientEval, R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (randX, randY);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, randomEval, R), R);
            zp = mulmod(zp, zeta, R);
            rTotal = addmod(rTotal, interpAt(pts, ce, mu), R);
            nuPow = mulmod(nuPow, nu, R);
        }
        // rotation set 2: rotations [-6, 0, 1]
        {
            uint256 zp = mulmod(nuPow, mulmod(z0Mu, zsInvArr[2], R), R);
            uint256[] memory ce = new uint256[](3);
            uint256[] memory pts = new uint256[](3);
            pts[0] = rotPoint(x, -6);
            pts[1] = rotPoint(x, 0);
            pts[2] = rotPoint(x, 1);
            (tx_, ty_) = (zc[0], zc[1]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, z[2], R), R);
            ce[1] = addmod(ce[1], mulmod(zp, z[0], R), R);
            ce[2] = addmod(ce[2], mulmod(zp, z[1], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (zc[2], zc[3]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, z[5], R), R);
            ce[1] = addmod(ce[1], mulmod(zp, z[3], R), R);
            ce[2] = addmod(ce[2], mulmod(zp, z[4], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (zc[4], zc[5]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, z[8], R), R);
            ce[1] = addmod(ce[1], mulmod(zp, z[6], R), R);
            ce[2] = addmod(ce[2], mulmod(zp, z[7], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (zc[6], zc[7]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, z[11], R), R);
            ce[1] = addmod(ce[1], mulmod(zp, z[9], R), R);
            ce[2] = addmod(ce[2], mulmod(zp, z[10], R), R);
            zp = mulmod(zp, zeta, R);
            (tx_, ty_) = (zc[8], zc[9]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, z[14], R), R);
            ce[1] = addmod(ce[1], mulmod(zp, z[12], R), R);
            ce[2] = addmod(ce[2], mulmod(zp, z[13], R), R);
            zp = mulmod(zp, zeta, R);
            rTotal = addmod(rTotal, interpAt(pts, ce, mu), R);
            nuPow = mulmod(nuPow, nu, R);
        }
        // rotation set 3: rotations [-1, 0]
        {
            uint256 zp = mulmod(nuPow, mulmod(z0Mu, zsInvArr[3], R), R);
            uint256[] memory ce = new uint256[](2);
            uint256[] memory pts = new uint256[](2);
            pts[0] = rotPoint(x, -1);
            pts[1] = rotPoint(x, 0);
            (tx_, ty_) = (lkp[0], lkp[1]);
            (tx_, ty_) = ecMul(tx_, ty_, zp);
            (fX, fY) = ecAdd(fX, fY, tx_, ty_);
            ce[0] = addmod(ce[0], mulmod(zp, lk[3], R), R);
            ce[1] = addmod(ce[1], mulmod(zp, lk[2], R), R);
            zp = mulmod(zp, zeta, R);
            rTotal = addmod(rTotal, interpAt(pts, ce, mu), R);
            nuPow = mulmod(nuPow, nu, R);
        }

        // F - rTotal*G - z0Mu*W + mu*W'
        (tx_, ty_) = ecMul(1, 2, rTotal);
        (fX, fY) = ecAdd(fX, fY, tx_, ty_ == 0 ? 0 : Q - ty_);
        (tx_, ty_) = ecMul(wX, wY, z0Mu);
        (fX, fY) = ecAdd(fX, fY, tx_, ty_ == 0 ? 0 : Q - ty_);
        (tx_, ty_) = ecMul(wpX, wpY, mu);
        (fX, fY) = ecAdd(fX, fY, tx_, ty_);

        return pairing(fX, fY, wpX, wpY);
    }

    function pairing(uint256 lx, uint256 ly, uint256 wx, uint256 wy)
        internal view returns (bool) {
        // e(LHS, G2) * e(W', -s*G2) == 1 (template ec_pairing :204-224)
        uint256[12] memory input = [
            lx, ly, G2_X1, G2_X0, G2_Y1, G2_Y0,
            wx, wy, SG2_X1, SG2_X0, Q - SG2_Y1, Q - SG2_Y0
        ];
        (bool ok, bytes memory out) = address(0x08).staticcall(
            abi.encode(input));
        require(ok, "pairing");
        return abi.decode(out, (uint256)) == 1;
    }
}
