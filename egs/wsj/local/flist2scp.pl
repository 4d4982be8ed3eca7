#!/usr/bin/env perl
# Turn a list of .wv1/.wav paths into an scp with utterance ids derived
# from the basename (fresh implementation of the Kaldi wsj flist2scp.pl
# contract): "<utt-id> <path>".

use strict;
use warnings;

while (<STDIN>) {
    chomp;
    next unless m/\S/;
    my $path = $_;
    my ($base) = $path =~ m|([^/]+)\.[^./]+$|;
    defined $base or die "flist2scp.pl: cannot parse $path\n";
    print lc($base) . " $path\n";
}
