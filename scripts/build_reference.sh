#!/bin/bash
# Build the reference libshoal/Green-Marl compiler + cpp_omp app binaries
# into .refbuild/ for the parity harness (scripts/parity.py).
#
# /root/reference is read-only, so it is copied here and patched:
#   * parse/gm_lex.c      — hand-written lexer (no flex in this image);
#                           committed at scripts/ref_patches/gm_lex.c
#   * g++12 const-correctness (map comparators)
#   * three use-after-free / dangling-pointer bugs in the Shoal codegen
#     extension (c_str() of temporaries, returning stack buffers) that
#     crash under modern glibc/compilers
#   * shl.h / shl_arrays.hpp — stub Shoal runtime (plain malloc, CRC16)
#     committed at scripts/ref_patches/shl.h
#   * sk_property(is_node) assert relaxed so edge-property apps generate
#
# Result: bin/gm_comp plus pagerank/hop_dist/triangle_counting (+others)
# under .refbuild/apps/output_cpp/bin/.
set -e
cd "$(dirname "$0")/.."
REPO=$(pwd)
RB=$REPO/.refbuild

if [ -x "$RB/apps/output_cpp/bin/pagerank" ] && [ "$1" != "-f" ]; then
    echo "reference already built ($RB); use -f to force"
    exit 0
fi

rm -rf "$RB"
mkdir -p "$RB"
cp -r /root/reference/* "$RB/"
mkdir -p "$RB/shoal/shoal/inc" "$RB/shoal/contrib/pycrc"
touch "$RB/shoal/shoal/common.mk"

cp "$REPO/scripts/ref_patches/gm_lex.c" "$RB/src/parse/gm_lex.c"
cp "$REPO/scripts/ref_patches/shl.h" "$RB/apps/output_cpp/gm_graph/inc/shl.h"
touch "$RB/apps/output_cpp/gm_graph/inc/shl_arrays.hpp"
touch "$RB/src/parse/gm_grammer.tab.c" "$RB/src/parse/gm_grammer.tab.h"

python3 - "$RB" <<'EOF'
import sys, re
rb = sys.argv[1]

def patch(path, old, new, count=1):
    p = rb + path
    s = open(p).read()
    assert old in s, (path, old[:60])
    s = s.replace(old, new)
    open(p, 'w').write(s)

# g++12: map comparators must be const-invocable
patch('/src/inc/gps_comminfo.h',
      'bool operator()(const gm_gps_comm_unit& lhs, const gm_gps_comm_unit& rhs) {',
      'bool operator()(const gm_gps_comm_unit& lhs, const gm_gps_comm_unit& rhs) const {')
patch('/src/inc/gm_misc.h',
      'bool operator()(const char* s1, const char* s2) {',
      'bool operator()(const char* s1, const char* s2) const {')

# glibc: errno is a macro; the definition signature gets mangled
s = open(rb + '/src/common/gm_error.cc').read()
s = re.sub(r'\berrno\b', 'errnumber_', s)
open(rb + '/src/common/gm_error.cc', 'w').write(s)

# UAF: c_str() of a destroyed temporary (two sites, same pattern)
uaf_old = '''        const char* num = a.num.c_str();

'''
s = open(rb + '/src/backend_cpp/gm_cpp_gen.cc').read()
s = s.replace('''        const char* num = a.num.c_str();

        // Due to data layout in adjacency lists, node and edge arrays are +1''',
'''        std::string num_s = a.num;

        // Due to data layout in adjacency lists, node and edge arrays are +1''')
s = s.replace('''        const char* num = a.num.c_str();


        // Due to data layout in adjacency lists, node and edge arrays are +1''',
'''        std::string num_s = a.num;


        // Due to data layout in adjacency lists, node and edge arrays are +1''')
s = s.replace('''            num = (std::string("(") + a.num + "+1" + ")").c_str();
        }''',
'''            num_s = std::string("(") + a.num + "+1" + ")";
        }
        const char* num = num_s.c_str();''')
s = s.replace('''        const char* s = sk_convert_array_name(std::string(src)).c_str();''',
'''        std::string s_hold_ = sk_convert_array_name(std::string(src));
        const char* s = s_hold_.c_str();''')
s = s.replace('''        const char *dest = sk_convert_array_name((*i).second).c_str();''',
'''        std::string dest_hold_ = sk_convert_array_name((*i).second);
        const char *dest = dest_hold_.c_str();''')
open(rb + '/src/backend_cpp/gm_cpp_gen.cc', 'w').write(s)

# dangling stack buffer return + edge-property assert
s = open(rb + '/src/inc/gm_backend_cpp.h').read()
s = s.replace('''                   std::string original_array)
{
    char str_buf[1024*8];''',
'''                   std::string original_array)
{
    static char str_buf[1024*8];''', 1)
s = s.replace('    assert (is_node); // If the input is not a node property, is it an edge property?',
              '    /* edge properties use the G.num_edges() sizing branch below */')
open(rb + '/src/inc/gm_backend_cpp.h', 'w').write(s)
# ---- round-3 patches: make the remaining cpp_omp apps generate ------------
# The Shoal (sk_) codegen extension asserts/crashes on app shapes its
# authors never exercised; relax it to best-effort (cost model only) so
# the parity harness gets more reference binaries.

# unknown array in sk_record_array_access -> skip recording
patch('/src/inc/gm_backend_cpp.h',
      """        string s(array_name);
        assert (sk_gm_arrays.find(s) != sk_gm_arrays.end()); // otherwise the array name used is wrong
""",
      """        string s(array_name);
        if (sk_gm_arrays.find(s) == sk_gm_arrays.end()) return; // unknown arrays: skip Shoal recording
""")

s2 = open(rb + '/src/backend_cpp/gm_cpp_gen.cc').read()
s2 = s2.replace("""    else
        assert (!"Unknown input to get_type_id");
}""", """    else
        return GMTYPE_INT; // cost-model only: unknown types sized as int
}""")
s2 = s2.replace("""        assert (!sk_fr_global_init);
        sk_fr_global_init = true;""", """        sk_fr_global_init = true;""")
# node_t/edge_t locals: the sk frame capture swallowed the type string,
# leaving a bare identifier in the generated code (sssp's "e")
s2 = s2.replace("""    } else {
        generate_idlist(v->get_idlist());
        skBody.pushln(";");
    }

    if (sk_on_frame) {""", """    } else {
        Body.push_spc(get_type_string(t));
        generate_idlist(v->get_idlist());
        Body.pushln(";");
        sk_on_frame = false;
    }

    if (sk_on_frame) {""")
open(rb + '/src/backend_cpp/gm_cpp_gen.cc', 'w').write(s2)

s2 = open(rb + '/src/backend_cpp/shl_extensions.cc').read()
s2 = s2.replace("""            // SK: it can also be nodes -> nbs -> nbs, which is what?
            assert(!"NYI: got LOOPS_NBS, but tail is not LOOP_NODES");""",
"""            // nodes -> nbs -> nbs etc.: treat as another nbs level
            shl__loops.push_back(LOOP_NBS);
            break;""")
s2 = s2.replace("""    default:
        assert(!"Don't know how to determine cost for given loop type");
    }""", """    default:
        shl__loops.push_back(LOOP_NODES);
        break;
    }""")
s2 = s2.replace("""        assert (tail==l || l==LOOP_NBS); // for tail = LOOP_EDGES, l = LOOP_NBS
        shl__loops.pop_back();""",
"""        shl__loops.pop_back(); // tolerate mismatched nesting (cost model only)""")
open(rb + '/src/backend_cpp/shl_extensions.cc', 'w').write(s2)

# per-region ft declaration: sk_fr_thread_init never reset, so later
# parallel regions referenced an undeclared ft (conduct)
s2 = open(rb + '/src/backend_cpp/gm_cpp_gen.cc').read()
s2 = s2.replace("""    assert(!sk_parallel || need_br);
    if (sk_parallel) sk_init_accessors(&Body);""",
"""    assert(!sk_parallel || need_br);
    if (sk_parallel) { sk_init_accessors(&Body); sk_fr_thread_init = false; }""")
s2 = s2.replace("""        res = true;
        Body.pushln("{");
        sk_init_accessors(&Body);""",
"""        res = true;
        Body.pushln("{");
        sk_init_accessors(&Body);
        sk_fr_thread_init = false;""")
# brace the multi-statement return (shl__end(); return ...;) so it stays
# one statement under unbraced if/else (conduct)
s2 = s2.replace("""    if (FE.get_current_proc()->find_info_bool(CPPBE_INFO_HAS_PROPDECL)) {
        Body.push(CLEANUP_PTR);
        Body.pushln("();");
    }

    Body.pushln("shl__end();\\n");

    Body.push("return");
    if (r->get_expr() != NULL) {
        Body.SPC();
        generate_expr(r->get_expr());
    }
    Body.pushln("; ");
}""", """    Body.pushln("{");
    if (FE.get_current_proc()->find_info_bool(CPPBE_INFO_HAS_PROPDECL)) {
        Body.push(CLEANUP_PTR);
        Body.pushln("();");
    }

    Body.pushln("shl__end();\\n");

    Body.push("return");
    if (r->get_expr() != NULL) {
        Body.SPC();
        generate_expr(r->get_expr());
    }
    Body.pushln("; ");
    Body.pushln("}");
}""")
open(rb + '/src/backend_cpp/gm_cpp_gen.cc', 'w').write(s2)

print('patches applied')
EOF

cd "$RB"
make compiler -j8 2>&1 | tail -1
cd apps/src
make -k 2>/dev/null | true
find ../output_cpp/generated -size 0 -delete 2>/dev/null || true
make -k 2>&1 | grep -c Assertion || true
cd ../output_cpp
PROGS=$(ls generated/*.cc 2>/dev/null | xargs -n1 basename | sed s/.cc//)
make -k -j8 PROGS="$PROGS" 2>&1 | grep -cE "^g\+\+" || true
ls bin/
